"""hala --pipeline-stages through the real CLI (VERDICT r3 item 5):
the GPipe step must train to the same losses as the plain single-mesh
step at float tolerance, on the 8-virtual-device mesh (2 pipeline
stages x 4-way data parallelism)."""

import numpy as np

# run_hala / losses / val_losses live in conftest.py — one
# harness shared by all the model-parallel CLI parity tests
from conftest import run_hala, losses, val_losses  # noqa: E402


def test_pipeline_stages_cli_matches_plain(tmp_path):
    rng = np.random.default_rng(0)
    # tokens 1..255: token 0 is the loss pad/ignore id, so keeping it
    # out of the stream makes every microbatch carry equal token counts
    # (mean-of-micro-means == global mean, exact loss comparability)
    train = rng.integers(1, 256, 64 * 8 * 2 * 4, dtype=np.uint16)
    train.tofile(tmp_path / "train.bin")

    plain = run_hala(tmp_path, tmp_path / "train.bin")
    assert plain.returncode == 0, plain.stderr[-2000:]
    pipe = run_hala(tmp_path, tmp_path / "train.bin",
                    "--pipeline-stages", "2")
    assert pipe.returncode == 0, pipe.stderr[-2000:]

    l_plain, l_pipe = losses(plain.stdout), losses(pipe.stdout)
    assert len(l_plain) >= 3 and len(l_pipe) >= 3, (plain.stdout,
                                                    pipe.stdout)
    np.testing.assert_allclose(l_pipe, l_plain, rtol=2e-4)
    # params are actually updating (not a frozen-params false pass);
    # on uniform random tokens the loss direction over 3 iters is
    # noise, so assert movement, not descent
    assert l_plain[0] != l_plain[-1]


def test_pipeline_lora_cli_matches_plain(tmp_path):
    """--pipeline-stages 2 x --lora: the adapters are stacked and
    pipelined with their blocks, the trainable mask freezes the base
    weights in the optimizer, and losses match the plain --lora step
    (lora_B starts at zero, so iter-0 losses also equal the no-lora
    run — a frozen-base false pass can't slip through that)."""
    rng = np.random.default_rng(2)
    train = rng.integers(1, 256, 64 * 8 * 2 * 4, dtype=np.uint16)
    train.tofile(tmp_path / "train.bin")

    plain = run_hala(tmp_path, tmp_path / "train.bin", "--lora")
    assert plain.returncode == 0, plain.stderr[-2000:]
    pipe = run_hala(tmp_path, tmp_path / "train.bin", "--lora",
                    "--pipeline-stages", "2")
    assert pipe.returncode == 0, pipe.stderr[-2000:]

    l_plain, l_pipe = losses(plain.stdout), losses(pipe.stdout)
    assert len(l_plain) >= 3 and len(l_pipe) >= 3, (plain.stdout,
                                                    pipe.stdout)
    np.testing.assert_allclose(l_pipe, l_plain, rtol=2e-4)
    assert l_plain[0] != l_plain[-1]       # adapters actually train


def test_pipeline_stages_guards(tmp_path):
    rng = np.random.default_rng(1)
    train = rng.integers(1, 256, 64 * 8 * 4, dtype=np.uint16)
    train.tofile(tmp_path / "train.bin")
    # gpt-nano has 3 layers -> 3 % 2 != 0 is caught... nano layer count
    # may differ; instead assert the device-divisibility guard (8 % 3)
    r = run_hala(tmp_path, tmp_path / "train.bin",
                 "--pipeline-stages", "3")
    assert r.returncode != 0
    assert "divisible" in (r.stderr + r.stdout)
