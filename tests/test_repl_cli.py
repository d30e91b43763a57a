"""hat end-to-end through the CLI with --bytes: generation runs, and
the same --seed samples identical text at --chunk 1 vs --chunk 4
(ADVICE r2: per-token keys are fold_in(gen_key, token_index) in both
paths, so chunking only changes dispatch granularity)."""

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
    exp = tmp_path_factory.mktemp("hat") / "nano"
    r = run([sys.executable, "-m", "haloop_tpu.init",
             "gpt-nano:300:64", str(exp)])
    assert r.returncode == 0, r.stderr
    return str(exp / "best.pt")


def gen(ckpt, tmp, *extra):
    r = run([sys.executable, "-m", "haloop_tpu.repl", "--bytes",
             "--steps", "24", "--histfile", str(tmp / "hist")]
            + list(extra) + [ckpt], input="hello\n")
    assert r.returncode == 0, r.stderr[-2000:]
    # the generated continuation is everything after the prompt marker
    return r.stdout


def test_hat_bytes_generates(nano_ckpt, tmp_path):
    out = gen(nano_ckpt, tmp_path, "--chunk", "1")
    assert out.startswith(">- ")


def test_hat_chunk_invariant_sampling(nano_ckpt, tmp_path):
    """Same --seed + --temperature sampling at chunk 1 vs 4 must print
    the same text (the r2 behavior drew different key streams)."""
    a = gen(nano_ckpt, tmp_path, "--chunk", "1", "--top-k", "8",
            "--seed", "5", "--temperature", "1.3")
    b = gen(nano_ckpt, tmp_path, "--chunk", "4", "--top-k", "8",
            "--seed", "5", "--temperature", "1.3")
    assert a == b, (a, b)


def test_hat_speculative_matches_greedy(nano_ckpt, tmp_path):
    """--spec produces exactly the greedy (--top-k 1) stream. fp32:
    draft verification evaluates K+1 positions in one forward, whose
    bf16 reduction order can flip near-ties of an untrained model —
    at fp32 the argmax stream is identical."""
    greedy = gen(nano_ckpt, tmp_path, "--chunk", "1", "--top-k", "1",
                 "--dtype", "float32")
    spec = gen(nano_ckpt, tmp_path, "--spec", "4", "--dtype", "float32")
    assert greedy == spec, (greedy, spec)


def test_hat_q8_generates(nano_ckpt, tmp_path):
    """--q8 through the real CLI: weight-only int8 generation runs the
    same jitted prefill+scan path and emits the full token budget."""
    out = gen(nano_ckpt, tmp_path, "--chunk", "4", "--q8")
    assert out.startswith(">- ")


def batch(ckpt, prompts_file, *extra):
    r = run([sys.executable, "-m", "haloop_tpu.repl", "--bytes",
             "--steps", "16", "--batch", str(prompts_file)]
            + list(extra) + [ckpt])
    assert r.returncode == 0, r.stderr[-2000:]
    return r.stdout


def test_hat_batch_matches_interactive_stream(nano_ckpt, tmp_path):
    """--batch FILE: every left-padded row must print exactly the text
    the interactive REPL streams for the same prompt (fp32 so bf16
    batched-matmul tie-flips on an untrained model can't differ)."""
    f = tmp_path / "prompts.txt"
    f.write_text("hello\nsome other prompt\nx\n")
    out = batch(nano_ckpt, f, "--dtype", "float32")
    lines = out.split("\n")
    assert len(lines) == 4 and lines[3] == "", out  # 3 rows + final \n
    solo = run([sys.executable, "-m", "haloop_tpu.repl", "--bytes",
                "--steps", "16", "--dtype", "float32",
                "--histfile", str(tmp_path / "hist"), nano_ckpt],
               input="some other prompt\n")
    assert solo.returncode == 0, solo.stderr[-2000:]
    # the REPL echoes ">- " then streams the continuation
    assert solo.stdout.startswith(">- ")
    assert lines[1] == solo.stdout[len(">- "):].split("\n")[0], \
        (lines[1], solo.stdout)


def test_hat_batch_q8(nano_ckpt, tmp_path):
    """--batch composes with --q8: int8 weight matmuls under the one
    batched prefill+scan program, one output line per prompt."""
    f = tmp_path / "prompts.txt"
    f.write_text("hello\nworld\n")
    out = batch(nano_ckpt, f, "--q8")
    lines = out.split("\n")
    assert len(lines) == 3 and lines[2] == "", out


def test_hat_batch_rejects_spec_and_chunk(nano_ckpt, tmp_path):
    f = tmp_path / "p.txt"
    f.write_text("a\n")
    r = run([sys.executable, "-m", "haloop_tpu.repl", "--bytes",
             "--steps", "4", "--batch", str(f), "--spec", "4", nano_ckpt])
    assert r.returncode != 0 and "--spec" in r.stderr


def test_hat_batch_rejects_overlong_prompt(nano_ckpt, tmp_path):
    """Prompt + steps past block_size must die cleanly (the KV cache
    caps at block_size), not silently clamp the cache write."""
    f = tmp_path / "p.txt"
    f.write_text("x" * 400 + "\n")          # gpt-nano:300: block_size 300
    r = run([sys.executable, "-m", "haloop_tpu.repl", "--bytes",
             "--steps", "16", "--batch", str(f), nano_ckpt])
    assert r.returncode != 0 and "block_size" in r.stderr
