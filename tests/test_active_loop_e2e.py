"""Active-learning loop end to end through the CLI (query-only mode):
three `random` iterations against a synthetic oracle, asserting the
dataset-rewrite plumbing converges the combined dataset to the oracle
(GWER 0) and that reruns are idempotent by file existence."""

import os
import random
import subprocess
import sys


def _corpus(root):
    random.seed(0)
    words = "ab cd ef gh ij kl mn op qr st".split()
    with open(root / "oracle.piece", "w") as o, \
            open(root / "dirty.piece", "w") as d, \
            open(root / "dur.seconds", "w") as s:
        for i in range(40):
            name = f"utt{i:03d}.wav"
            text = " ".join(random.choices(words, k=5))
            o.write(f"{name}\t{text}\n")
            bad = " ".join(random.choices(words, k=5)) if i % 3 == 0 \
                else text
            d.write(f"{name}\t{bad}\n")
            s.write(f"{name}\t{random.uniform(2, 9):.2f}\n")
    (root / "vocab").write_text("\n".join(words))


def _run(root):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""
    return subprocess.run(
        [sys.executable, "-m", "haloop_tpu.active_loop", "random",
         "--oracle", str(root / "oracle.piece"),
         "--initial-corrupted", str(root / "dirty.piece"),
         "--eval", str(root / "oracle.piece"),
         "--vocab", str(root / "vocab"),
         "--duration", str(root / "dur.seconds"),
         "--query-size", "8", "--steps", "3", "--stop-before", "3",
         "--exp", str(root / "exp"), "--device", "cpu"],
        env=env, capture_output=True, text=True)


def test_active_loop_random_query_cycle(tmp_path):
    _corpus(tmp_path)
    r = _run(tmp_path)
    assert r.returncode == 0, r.stderr
    # three iterations of dataset rewrites on disk
    for step in range(3):
        d = tmp_path / "exp" / f"{step:02d}"
        assert (d / "combined_train.txt.piece").exists(), r.stderr
        assert (d / "clean.txt.piece").exists()
    # the final (is_final) query flushes everything: combined == oracle
    assert "%GWER 0.0" in r.stderr
    # rerun is idempotent (resumable by file existence): still succeeds
    r2 = _run(tmp_path)
    assert r2.returncode == 0, r2.stderr
