"""Active-loop strategies over synthetic corrupted-label data (the
subprocess-free strategies; the hac-driven ones are exercised by CLI)."""

import numpy as np
import pandas as pd
import pytest

from haloop_tpu.active_loop import make_parser, run_step


@pytest.fixture
def data(tmp_path):
    rng = np.random.default_rng(0)
    N = 30
    oracle = tmp_path / "oracle.txt"
    corrupted = tmp_path / "corrupted.txt"
    durations = tmp_path / "durations.txt"
    with open(oracle, "w") as fo, open(corrupted, "w") as fc, \
            open(durations, "w") as fd:
        for i in range(N):
            words = [str(rng.integers(4, 99)) for _ in
                     range(rng.integers(2, 9))]
            fo.write(f"utt{i:02d}\t{' '.join(words)}\n")
            corr = [w if rng.random() > 0.4 else str(rng.integers(4, 99))
                    for w in words]
            fc.write(f"utt{i:02d}\t{' '.join(corr)}\n")
            fd.write(f"utt{i:02d}\t{rng.uniform(1, 8):.2f}\n")
    return oracle, corrupted, durations


def run_strategy(tmp_path, data, strategy, query="6"):
    oracle, corrupted, durations = data
    args = make_parser().parse_args([
        "--oracle", str(oracle), "--initial-corrupted", str(corrupted),
        "--eval", str(oracle), "--duration", str(durations),
        "--query-size", query, "--exp", str(tmp_path / "exp"),
        "--steps", "1", "--stop-before", "1", strategy])
    exp = tmp_path / "exp" / "00"
    return run_step(args, exp), exp


def test_random_strategy(tmp_path, data):
    path, exp = run_strategy(tmp_path, data, "random")
    assert path.exists()
    combined = pd.read_csv(path, sep="\t", names=["utt", "text"])
    assert len(combined) == 30
    clean = pd.read_csv(exp / "clean.txt.piece", sep="\t",
                        names=["utt", "text"])
    assert len(clean) == 6


def test_long_strategy_prefers_long(tmp_path, data):
    path, exp = run_strategy(tmp_path, data, "long")
    oracle, corrupted, durations = data
    corr = {l.split("\t")[0]: l.split("\t")[1].strip()
            for l in open(corrupted)}
    clean = pd.read_csv(exp / "clean.txt.piece", sep="\t",
                        names=["utt", "text"])
    picked = set(clean["utt"])
    picked_lens = [len(corr[u].split()) for u in picked]
    other_lens = [len(t.split()) for u, t in corr.items()
                  if u not in picked]
    assert min(picked_lens) >= max(other_lens) - 1  # longest first


def test_oracle_max_wer_strategy(tmp_path, data):
    path, exp = run_strategy(tmp_path, data, "oracle-max-wer")
    # the queried utterances must come from the most-corrupted end
    q = pd.read_csv(exp / "query_result.txt.piece", sep="\t",
                    names=["utt", "text"])
    assert len(q) == 6


def test_query_hours(tmp_path, data):
    path, exp = run_strategy(tmp_path, data, "random", query="1h")
    clean = pd.read_csv(exp / "clean.txt.piece", sep="\t",
                        names=["utt", "text"])
    assert 1 <= len(clean) <= 30
