import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from haloop_tpu.align import align, edit_distance


def test_edit_distance_counts():
    d = edit_distance(list("kitten"), list("sitting"))
    assert d['total'] == 3 and d['sub'] == 2 and d['ins'] == 1
    d = edit_distance(["a", "b"], ["a", "b"])
    assert d['total'] == 0


def test_edit_distance_matches_reference():
    try:
        kaldialign = __import__("kaldialign")
    except ImportError:
        pytest.skip("kaldialign not installed")
    for a, b in [("hello", "yellow"), ("abc", ""), ("", "xyz")]:
        mine = edit_distance(list(a), list(b))
        ref = kaldialign.edit_distance(list(a), list(b))
        assert mine['total'] == ref['total']


def test_edit_distance_matches_dp_oracle():
    """Randomized comparison against an independent in-test Levenshtein
    DP (the kaldialign oracle above skips on images without the wheel,
    so this is the always-on ground truth for total/ins/del/sub)."""

    def oracle(a, b):
        n, m = len(a), len(b)
        # (cost, ins, dels, sub) per cell
        row = [(j, j, 0, 0) for j in range(m + 1)]
        for i in range(1, n + 1):
            prev, row = row, [(i, 0, i, 0)] + [None] * m
            for j in range(1, m + 1):
                cands = [(prev[j][0] + 1, prev[j][1], prev[j][2] + 1,
                          prev[j][3]),                      # delete a[i-1]
                         (row[j - 1][0] + 1, row[j - 1][1] + 1,
                          row[j - 1][2], row[j - 1][3])]    # insert b[j-1]
                if a[i - 1] == b[j - 1]:
                    cands.append(prev[j - 1])
                else:
                    cands.append((prev[j - 1][0] + 1, prev[j - 1][1],
                                  prev[j - 1][2], prev[j - 1][3] + 1))
                row[j] = min(cands)
        total, ins, dels, sub = row[m]
        return {"total": total, "ins": ins, "del": dels, "sub": sub}

    rng = np.random.default_rng(0)
    for _ in range(120):
        a = [int(t) for t in rng.integers(0, 4, rng.integers(0, 9))]
        b = [int(t) for t in rng.integers(0, 4, rng.integers(0, 9))]
        mine = edit_distance(a, b)
        want = oracle(a, b)
        assert mine["total"] == want["total"], (a, b, mine, want)
        # ins/del/sub decompositions can differ between equally-minimal
        # alignments, but their sum and the length identity cannot
        assert mine["ins"] + mine["del"] + mine["sub"] == mine["total"]
        # alignment length identity holds for any decomposition
        assert len(a) - mine["del"] + mine["ins"] == len(b)


def test_align_structure():
    pairs = align(list("abc"), list("axc"), "*")
    assert len(pairs) == 3
    assert pairs[0] == ("a", "a") and pairs[2] == ("c", "c")
    pairs = align([], list("ab"), "*")
    assert pairs == [("*", "a"), ("*", "b")]


def test_wer_tool(tmp_path):
    ref = tmp_path / "ref.txt"
    hyp = tmp_path / "hyp.txt"
    ref.write_text("utt1 the cat sat\nutt2 hello world\n")
    hyp.write_text("utt1 the hat sat\nutt2 hello world\n")
    from haloop_tpu.wer import compute_wer_pointwise, format_wer, read_text
    df = compute_wer_pointwise(read_text(ref), read_text(hyp))
    assert df['total'].sum() == 1
    out = format_wer(df)
    assert out[0] == '%WER'
    assert out[1] == 20.0  # 1 error / 5 ref words


def test_corr_rank():
    import pandas as pd
    from haloop_tpu.corr import rank_corr
    l = pd.DataFrame(index=["a", "b", "c"])
    r = pd.DataFrame(index=["a", "b", "c"])
    assert abs(rank_corr(l.copy(), r.copy()) - 1.0) < 1e-9
    r2 = pd.DataFrame(index=["c", "b", "a"])
    assert rank_corr(l.copy(), r2.copy()) < 0


def test_mlm_mask_tokens():
    from haloop_tpu.mlm import mask_tokens
    rng = np.random.default_rng(0)
    x = rng.integers(1, 50254, size=(8, 128))
    xm, labels = mask_tokens(x, rng=rng)
    masked = labels != 0
    frac = masked.mean()
    assert 0.05 < frac < 0.30
    # labels hold original tokens at masked positions
    np.testing.assert_array_equal(labels[masked], x[masked])
    # unmasked inputs unchanged
    np.testing.assert_array_equal(xm[~masked], x[~masked])


def test_active_loop_log_parsing(tmp_path):
    from haloop_tpu.active_loop import (
        read_grads, test_log_to_dataset, training_log_to_dataset)
    log = tmp_path / "train.log"
    log.write_text(
        "junk line\n"
        "testing 12 attempts 1\n"
        "12\t3\thyp0\thello world\n"
        "12\t3\tref\thello word\n"
        "12\t3\tali0\t··hh·ell··l·o·· wwo·rrl·d··\n"
        "12\t3\tstat0\tlog_prob=-1.5 log_prob_per_token=-0.5 "
        "entropy_per_token=0.1 prompt=None ins=0 del=0 sub=1 total=1 "
        "length=2 ler=0.5 wer=0.5\n")
    hyps = training_log_to_dataset(log)
    assert hyps.loc[3, 'hyp_text'] == 'hello world'
    stats = test_log_to_dataset(log)
    assert abs(stats.loc[3, 'log_prob'] + 1.5) < 1e-9

    grads = tmp_path / "grads.txt"
    grads.write_text("grad_norm,loss\t7\t0.25\t1.5\nnoise\n")
    g = read_grads(grads)
    assert abs(g.loc[7, 'grad_norm'] - 0.25) < 1e-9


def test_symbol_tape():
    from haloop_tpu.symbol_tape import SymbolTapeNoPad
    data = np.frombuffer(b"ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuv",
                         dtype=np.uint8)
    tape = SymbolTapeNoPad(data, batch_size=2, bptt_len=8)
    assert len(tape) == 3
    b0 = tape[0]
    assert b0.shape == (8, 2)
    assert b0[0, 0] == ord('A')
    # second tape starts offset by tape_len - 1
    assert b0[0, 1] == data[tape.tape_len - 1]


def test_vocab_roundtrip():
    from haloop_tpu.symbol_tape import Vocabulary, WordVocabulary, make_vocab
    v = Vocabulary.bytes()
    ids = v.encode(b"hi there")
    labels, words = v.decode(ids.tolist())
    assert labels == b"hi there"
    assert words == [b"hi", b"there"]

    a = Vocabulary.ascii()
    ids = a.encode("Hello")
    labels, _ = a.decode(ids.tolist())
    assert labels == "Hello"

    w = make_vocab("512")
    ids = w.encode("17 23")
    assert ids.tolist() == [17, 23]

    # spin prompt merging
    wv = WordVocabulary()
    for t in ["<↓>", "<↑>", "a", "b"]:
        wv.get_idx(t, extend_vocab=True)
    ids = wv.encode("<↓> <↑> a b")
    assert ids.tolist() == [wv.get_idx("<↓>"), wv.get_idx("a"),
                            wv.get_idx("b")]


def test_duration_batch_sampler():
    from haloop_tpu.sampler import DurationBatchSampler

    class DS:
        def __len__(self):
            return 6

        def duration(self, i):
            return [10, 10, 10, 100, 10, 10][i]

    batches = list(DurationBatchSampler(DS(), max_duration=40))
    assert all(len(b) >= 1 for b in batches)
    assert sorted(x for b in batches for x in b) == list(range(6))


def test_features_fbank_shapes():
    from haloop_tpu.features import fbank, fbank_jax, mfcc, mel_filterbank
    wav = np.sin(np.linspace(0, 1000, 16000)).astype(np.float32)
    out = fbank(wav)
    # 16000 samples @ 25ms/10ms snip_edges -> 1 + (16000-400)//160 = 98
    assert out.shape == (98, 80)
    assert np.isfinite(out).all()

    ceps = mfcc(wav)
    assert ceps.shape == (98, 13)

    fb = mel_filterbank(80)
    assert fb.shape == (257, 80)
    # every filter has positive mass; filters cover the band
    assert (fb.sum(0) > 0).all()

    import jax.numpy as jnp
    # batched jax frontend parity on a broadband signal (every mel bin
    # energized; pure tones leave near-empty bins where fp32-vs-fp64 FFT
    # noise dominates the log)
    noise = np.random.default_rng(0).normal(
        scale=0.1, size=16000).astype(np.float32)
    nout = fbank(noise)
    jout, jlens = fbank_jax(jnp.asarray(noise)[None], jnp.array([16000]))
    assert jout.shape == (1, 98, 80)
    np.testing.assert_allclose(np.asarray(jout[0]), nout, atol=2e-2)
    assert int(jlens[0]) == 98


def test_sinusoids_dataset():
    from haloop_tpu.sinusoids import SyntheticAlignments
    ds = SyntheticAlignments(examples_per_bin=10, max=100)
    idx, inputs, text = ds[5]
    assert inputs.shape[1] == 80
    toks = [int(t) for t in text.split()]
    assert all(4 <= t < 512 for t in toks)
    # deterministic
    _, inputs2, text2 = ds[5]
    assert text == text2
    np.testing.assert_array_equal(inputs, inputs2)


def test_collator_bucketing():
    from haloop_tpu.dataloader import Collator
    from haloop_tpu.symbol_tape import make_vocab
    vocab = make_vocab("512")
    batch = [(0, np.zeros((50, 80), np.float32), "4 5 6"),
             (1, np.zeros((130, 80), np.float32), "7 8")]
    idxs, inputs, targets, il, tl = Collator(vocab)(batch)
    assert inputs.shape[1] == 256  # smallest bucket >= 130
    assert targets.shape[1] == 16
    np.testing.assert_array_equal(il, [50, 130])
    np.testing.assert_array_equal(tl, [3, 2])


def test_pt_loader_plain_tensors(tmp_path):
    torch = pytest.importorskip("torch")
    from haloop_tpu.pt_loader import load_pt
    obj = {"a": torch.arange(6, dtype=torch.float32).reshape(2, 3),
           "nested": {"b": torch.tensor([1, 2], dtype=torch.int64)},
           "scalar": 3,
           "bf16": torch.ones(4, dtype=torch.bfloat16) * 1.5}
    torch.save(obj, tmp_path / "x.pt")
    back = load_pt(tmp_path / "x.pt")
    np.testing.assert_allclose(back["a"], [[0, 1, 2], [3, 4, 5]])
    np.testing.assert_array_equal(back["nested"]["b"], [1, 2])
    np.testing.assert_allclose(back["bf16"], [1.5] * 4)


def test_dataloader_batch_sampler_epoch_and_shard():
    """The batch_sampler path must honor the same epoch/multi-host
    contract as the plain index path: a shuffling DurationBatchSampler
    gets its epoch bumped (else every epoch repeats epoch-0's order),
    and process shards take disjoint equal-count batch slices."""
    from haloop_tpu.dataloader import DataLoader
    from haloop_tpu.sampler import DurationBatchSampler

    class DS:
        def __init__(self):
            self.rows = [(i, np.zeros((3, 2)), 'x') for i in range(24)]

        def __len__(self):
            return len(self.rows)

        def __getitem__(self, i):
            return self.rows[i]

        def duration(self, i):
            return 10.0

    def collate(items):
        return [i for i, _, _ in items]

    sampler = DurationBatchSampler(DS(), max_duration=40, shuffle=True,
                                   seed=0)
    loader = DataLoader(DS(), collate, batch_sampler=sampler)
    epoch1 = [tuple(b) for b in loader]
    epoch2 = [tuple(b) for b in loader]
    flat = sorted(i for b in epoch1 for i in b)
    assert flat == list(range(24))               # full coverage
    assert epoch1 != epoch2                      # reshuffled per epoch

    shards = []
    for pi in range(2):
        s = DurationBatchSampler(DS(), max_duration=40, shuffle=True,
                                 seed=0)
        dl = DataLoader(DS(), collate, batch_sampler=s,
                        process_shard=(pi, 2))
        shards.append([tuple(b) for b in dl])
    assert len(shards[0]) == len(shards[1])      # equal batch counts
    i0 = {i for b in shards[0] for i in b}
    i1 = {i for b in shards[1] for i in b}
    assert not (i0 & i1)                         # disjoint
