"""hala --tensor-parallel through the real CLI: Megatron-style sharding
(parallel/tensor.py — c_attn/c_fc row-sharded, c_proj column-sharded,
lm_head vocab-sharded over a 'model' mesh axis, GSPMD collectives) must
train to the same losses as the plain single-mesh step at float
tolerance, pure (model=8) and composed with data parallelism
(4 data x 2 model, 2 data x 4 model), on the 8-virtual-device mesh.
(The reference's only distributed surface is DDP,
ha/attention_loop.py:67-80; tensor parallelism is beyond-parity scope —
parity is against OUR plain step's math. pp and sp have the same
CLI-level test; this closes the tp gap from VERDICT r4 item 2.)"""

import numpy as np

# run_hala / losses / val_losses live in conftest.py — one
# harness shared by all the model-parallel CLI parity tests
from conftest import run_hala, losses, val_losses  # noqa: E402


def test_tensor_parallel_cli_matches_plain(tmp_path):
    rng = np.random.default_rng(0)
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
    # params are actually updating (not a frozen-params false pass)
    assert l_plain[0] != l_plain[-1]

    # composed with data parallelism: 4 data x 2 model — the production
    # layout (model inner so its per-block all-reduces ride neighbors)
    tp2 = run_hala(tmp_path, tmp_path / "train.bin", *eval_args,
                   "--tensor-parallel", "2")
    assert tp2.returncode == 0, tp2.stderr[-2000:]
    np.testing.assert_allclose(losses(tp2.stdout), l_plain, rtol=2e-4)
    np.testing.assert_allclose(val_losses(tp2.stdout), v_plain,
                               rtol=2e-4)

    # 2 data x 4 model
    tp4 = run_hala(tmp_path, tmp_path / "train.bin", *eval_args,
                   "--tensor-parallel", "4")
    assert tp4.returncode == 0, tp4.stderr[-2000:]
    np.testing.assert_allclose(losses(tp4.stdout), l_plain, rtol=2e-4)
    np.testing.assert_allclose(val_losses(tp4.stdout), v_plain,
                               rtol=2e-4)


def test_tensor_parallel_pure_model_sharding(tmp_path):
    """model=8 (no data axis): every matmul shard is 1/8 width and the
    batch is replicated — exercises the GSPMD path with ndata == 1."""
    rng = np.random.default_rng(2)
    train = rng.integers(1, 256, 64 * 8 * 2 * 4, dtype=np.uint16)
    train.tofile(tmp_path / "train.bin")

    plain = run_hala(tmp_path, tmp_path / "train.bin")
    assert plain.returncode == 0, plain.stderr[-2000:]
    l_plain = losses(plain.stdout)
    assert len(l_plain) >= 3, plain.stdout

    tp8 = run_hala(tmp_path, tmp_path / "train.bin",
                   "--tensor-parallel", "8")
    assert tp8.returncode == 0, tp8.stderr[-2000:]
    np.testing.assert_allclose(losses(tp8.stdout), l_plain, rtol=2e-4)


def test_tensor_parallel_guards(tmp_path):
    rng = np.random.default_rng(1)
    train = rng.integers(1, 256, 64 * 8 * 4, dtype=np.uint16)
    train.tofile(tmp_path / "train.bin")

    # device divisibility: 8 % 3 != 0
    r = run_hala(tmp_path, tmp_path / "train.bin",
                 "--tensor-parallel", "3")
    assert r.returncode != 0
    assert "divisible" in (r.stderr + r.stdout)

    # no composition with pipeline stages
    r = run_hala(tmp_path, tmp_path / "train.bin",
                 "--tensor-parallel", "2", "--pipeline-stages", "2")
    assert r.returncode != 0
    assert "compose" in (r.stderr + r.stdout)
