"""hala --tensor-parallel x --sequence-parallel COMPOSED through the
real CLI (the r4 verdict's "cash the yet" item): Megatron param
sharding over 'model' (GSPMD) + ring attention manual over 'seq'
(gpt seq_ring_spmd) must train to the same losses as the plain step at
float tolerance, with and without a data axis, on the 8-virtual-device
mesh. (The reference has DDP only, ha/attention_loop.py:67-80; every
parity bar here is OUR plain step's math.)"""

import numpy as np

# run_hala / losses / val_losses live in conftest.py — one
# harness shared by all the model-parallel CLI parity tests
from conftest import run_hala, losses, val_losses  # noqa: E402


def test_tp_sp_composed_cli_matches_plain(tmp_path):
    rng = np.random.default_rng(0)
    # tokens 1..255 (0 is the ignore id): equal valid-token counts per
    # shard, so sharded means equal the global mean at float tolerance
    train = rng.integers(1, 256, 64 * 8 * 2 * 4, dtype=np.uint16)
    train.tofile(tmp_path / "train.bin")
    rng.integers(1, 256, 64 * 8, dtype=np.uint16).tofile(
        tmp_path / "val.bin")
    eval_args = ("--eval", str(tmp_path / "val.bin"),
                 "--eval-interval", "2")

    plain = run_hala(tmp_path, tmp_path / "train.bin", *eval_args)
    assert plain.returncode == 0, plain.stderr[-2000:]
    l_plain, v_plain = losses(plain.stdout), val_losses(plain.stdout)
    assert len(l_plain) >= 3 and len(v_plain) >= 1, plain.stdout
    assert l_plain[0] != l_plain[-1]

    # 2 data x 2 model x 2 seq: all three axes live at once
    full = run_hala(tmp_path, tmp_path / "train.bin", *eval_args,
                    "--tensor-parallel", "2", "--sequence-parallel", "2")
    assert full.returncode == 0, full.stderr[-2000:]
    np.testing.assert_allclose(losses(full.stdout), l_plain, rtol=2e-4)
    np.testing.assert_allclose(val_losses(full.stdout), v_plain,
                               rtol=2e-4)

    # 1 data x 2 model x 4 seq: pure model x sequence
    tpsp = run_hala(tmp_path, tmp_path / "train.bin", *eval_args,
                    "--tensor-parallel", "2", "--sequence-parallel", "4")
    assert tpsp.returncode == 0, tpsp.stderr[-2000:]
    np.testing.assert_allclose(losses(tpsp.stdout), l_plain, rtol=2e-4)
    np.testing.assert_allclose(val_losses(tpsp.stdout), v_plain,
                               rtol=2e-4)


def test_tp_sp_composed_guards(tmp_path):
    rng = np.random.default_rng(1)
    train = rng.integers(1, 256, 64 * 8 * 4, dtype=np.uint16)
    train.tofile(tmp_path / "train.bin")

    # tp x sp must divide the device count: 2 x 3 on 8 devices
    r = run_hala(tmp_path, tmp_path / "train.bin",
                 "--tensor-parallel", "2", "--sequence-parallel", "3")
    assert r.returncode != 0
    assert "divisible" in (r.stderr + r.stdout)

    # pipeline still composes with neither
    r = run_hala(tmp_path, tmp_path / "train.bin",
                 "--pipeline-stages", "2", "--sequence-parallel", "2")
    assert r.returncode != 0
    assert "compose" in (r.stderr + r.stdout)
