"""hala --sequence-parallel through the real CLI: ring-attention
sequence sharding must train to the same losses as the plain
single-mesh step at float tolerance, pure (seq=8) and composed with
data parallelism (2 data x 4 seq), on the 8-virtual-device mesh.
(Sequence parallelism is the SURVEY §5.7 extension — the reference has
no such surface; parity is against OUR plain step's math.)"""

import numpy as np

# run_hala / losses / val_losses live in conftest.py — one
# harness shared by all the model-parallel CLI parity tests
from conftest import run_hala, losses, val_losses  # noqa: E402


def test_sequence_parallel_cli_matches_plain(tmp_path):
    rng = np.random.default_rng(0)
    # tokens 1..255: token 0 is the loss pad/ignore id, so every shard
    # carries equal valid-token counts and the seq-psum'd mean equals
    # the global mean exactly (loss comparability at float tolerance)
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

    # pure sequence parallelism: T shards over all 8 devices (train
    # AND eval run sequence-sharded — eval must honor the same T/N
    # memory scaling)
    sp8 = run_hala(tmp_path, tmp_path / "train.bin", *eval_args,
                   "--sequence-parallel", "8")
    assert sp8.returncode == 0, sp8.stderr[-2000:]
    np.testing.assert_allclose(losses(sp8.stdout), l_plain, rtol=2e-4)
    np.testing.assert_allclose(val_losses(sp8.stdout), v_plain,
                               rtol=2e-4)

    # composed with data parallelism: 2 data x 4 seq
    sp4 = run_hala(tmp_path, tmp_path / "train.bin", *eval_args,
                   "--sequence-parallel", "4")
    assert sp4.returncode == 0, sp4.stderr[-2000:]
    np.testing.assert_allclose(losses(sp4.stdout), l_plain, rtol=2e-4)
    np.testing.assert_allclose(val_losses(sp4.stdout), v_plain,
                               rtol=2e-4)


def test_sequence_parallel_composes_with_lora(tmp_path):
    """LoRA adapters are token-local (low-rank linears on the qkv
    projection), so they shard over 'seq' like any activation math;
    the masked optimizer must train them to the same losses as the
    unsharded LoRA step."""
    rng = np.random.default_rng(2)
    train = rng.integers(1, 256, 64 * 8 * 2 * 4, dtype=np.uint16)
    train.tofile(tmp_path / "train.bin")

    plain = run_hala(tmp_path, tmp_path / "train.bin", "--lora")
    assert plain.returncode == 0, plain.stderr[-2000:]
    l_plain = losses(plain.stdout)
    assert len(l_plain) >= 3, plain.stdout

    sp = run_hala(tmp_path, tmp_path / "train.bin", "--lora",
                  "--sequence-parallel", "8")
    assert sp.returncode == 0, sp.stderr[-2000:]
    np.testing.assert_allclose(losses(sp.stdout), l_plain, rtol=2e-4)


def test_sequence_parallel_guards(tmp_path):
    rng = np.random.default_rng(1)
    train = rng.integers(1, 256, 64 * 8 * 4, dtype=np.uint16)
    train.tofile(tmp_path / "train.bin")

    # device divisibility: 8 % 3 != 0
    r = run_hala(tmp_path, tmp_path / "train.bin",
                 "--sequence-parallel", "3")
    assert r.returncode != 0
    assert "divisible" in (r.stderr + r.stdout)

    # no composition with pipeline stages (tp x sp composes — see
    # tests/test_hala_tpsp.py)
    r = run_hala(tmp_path, tmp_path / "train.bin",
                 "--sequence-parallel", "2", "--pipeline-stages", "2")
    assert r.returncode != 0
    assert "compose" in (r.stderr + r.stdout)

    # batch rows must divide the data axis of the (data, seq) mesh —
    # a clean SystemExit, not a shard_map traceback (this guard
    # briefly regressed to striped-only in r5: it must fire for the
    # default contiguous schedule too)
    r = run_hala(tmp_path, tmp_path / "train.bin",
                 "--sequence-parallel", "2", "--batch_size", "6")
    assert r.returncode != 0
    assert "not divisible by the data axis" in (r.stderr + r.stdout)


def test_sequence_parallel_striped_cli_matches_plain(tmp_path):
    """--ring-schedule striped (zigzag layout, masked blocks skipped)
    must train and eval to the SAME losses as the plain step — the
    schedule changes which device computes what, never the math."""
    rng = np.random.default_rng(3)
    train = rng.integers(1, 256, 64 * 8 * 2 * 4, dtype=np.uint16)
    train.tofile(tmp_path / "train.bin")
    rng.integers(1, 256, 64 * 8, dtype=np.uint16).tofile(
        tmp_path / "val.bin")
    eval_args = ("--eval", str(tmp_path / "val.bin"),
                 "--eval-interval", "2")

    plain = run_hala(tmp_path, tmp_path / "train.bin", *eval_args)
    assert plain.returncode == 0, plain.stderr[-2000:]
    l_plain, v_plain = losses(plain.stdout), val_losses(plain.stdout)
    assert len(l_plain) >= 3 and len(v_plain) >= 1

    # pure striped sp=4 (two stripes of 8 per shard) and 2 data x 4 seq
    st = run_hala(tmp_path, tmp_path / "train.bin", *eval_args,
                  "--sequence-parallel", "4",
                  "--ring-schedule", "striped")
    assert st.returncode == 0, st.stderr[-2000:]
    np.testing.assert_allclose(losses(st.stdout), l_plain, rtol=2e-4)
    np.testing.assert_allclose(val_losses(st.stdout), v_plain,
                               rtol=2e-4)

    # striped guard: block_size 64 % (2*8) == 0 is fine, but tp x
    # striped must refuse
    r = run_hala(tmp_path, tmp_path / "train.bin",
                 "--sequence-parallel", "2", "--tensor-parallel", "2",
                 "--ring-schedule", "striped")
    assert r.returncode != 0
    assert "striped" in (r.stderr + r.stdout)
