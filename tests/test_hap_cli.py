"""hap end-to-end through the CLI: init a tiny GPT with hai, score a
byte-tokenized corpus, and assert the token-budget packing produces
byte-identical output to reference-style fixed batching."""

import os
import subprocess
import sys

import pytest


def run(cmd, **kw):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""
    return subprocess.run(cmd, env=env, capture_output=True, text=True,
                          **kw)


@pytest.fixture(scope="module")
def nano_ckpt(tmp_path_factory):
    exp = tmp_path_factory.mktemp("hap") / "nano"
    r = run([sys.executable, "-m", "haloop_tpu.init",
             "gpt-nano:300:64", str(exp)])
    assert r.returncode == 0, r.stderr
    return str(exp / "best.pt")


LINES = ("hello world\n"
         "the quick brown fox jumps over the lazy dog\n"
         "hi\n"
         "a considerably longer sentence that should land in a wider "
         "bucket than the rest\n"
         "short\n")


def test_hap_packing_matches_fixed_batching(nano_ckpt):
    packed = run([sys.executable, "-m", "haloop_tpu.score", "--bytes",
                  "--no-pack", nano_ckpt], input=LINES)
    fixed = run([sys.executable, "-m", "haloop_tpu.score", "--bytes",
                 "--no-pack", "--tokens-per-batch", "0", "--batch-size",
                 "2", nano_ckpt], input=LINES)
    assert packed.returncode == 0, packed.stderr
    assert fixed.returncode == 0, fixed.stderr
    assert packed.stdout == fixed.stdout
    # three columns per line, one line per input sentence
    rows = [l.split("\t") for l in packed.stdout.strip().split("\n")]
    assert len(rows) == 5
    assert all(len(r) == 3 for r in rows)
    # byte tokenizer: token count equals byte length (within block size)
    assert int(rows[0][1]) == len("hello world")


def test_hap_sequence_packing_matches_unpacked(nano_ckpt):
    """Default sequence packing (segments share full-width rows with
    block-diagonal attention) scores every sentence like row-per-sentence
    batching: same rows/columns, values equal to float tolerance."""
    seq = run([sys.executable, "-m", "haloop_tpu.score", "--bytes",
               nano_ckpt], input=LINES)
    unpacked = run([sys.executable, "-m", "haloop_tpu.score", "--bytes",
                    "--no-pack", nano_ckpt], input=LINES)
    assert seq.returncode == 0, seq.stderr
    a = [l.split("\t") for l in seq.stdout.strip().split("\n")]
    b = [l.split("\t") for l in unpacked.stdout.strip().split("\n")]
    assert len(a) == len(b) == 5
    for ra, rb in zip(a, b):
        assert abs(float(ra[0]) - float(rb[0])) <= 2e-3, (ra, rb)
        assert ra[1:] == rb[1:]


def test_hap_q8_scores_close_to_fp(nano_ckpt):
    """--q8 through the real CLI: same rows/token counts, per-sentence
    NLL within quantization noise of the exact run (the library-level
    bound is drift.mean < 0.02 per token, tests/test_quant.py)."""
    q8 = run([sys.executable, "-m", "haloop_tpu.score", "--bytes",
              "--q8", nano_ckpt], input=LINES)
    fp = run([sys.executable, "-m", "haloop_tpu.score", "--bytes",
              nano_ckpt], input=LINES)
    assert q8.returncode == 0, q8.stderr
    assert fp.returncode == 0, fp.stderr
    a = [l.split("\t") for l in q8.stdout.strip().split("\n")]
    b = [l.split("\t") for l in fp.stdout.strip().split("\n")]
    assert len(a) == len(b) == 5
    for ra, rb in zip(a, b):
        assert abs(float(ra[0]) - float(rb[0])) <= 0.05, (ra, rb)
        assert ra[1:] == rb[1:]
