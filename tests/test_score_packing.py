"""hap token-budget packing (score.pack_by_tokens): order-preserving,
budget-respecting, exhaustive."""

import numpy as np

from haloop_tpu.score import pack_by_tokens, _bucket


def test_pack_preserves_order_and_budget():
    rng = np.random.default_rng(0)
    lens = rng.integers(1, 400, 200).tolist()
    toks = [list(range(n)) for n in lens]
    batches = list(pack_by_tokens(iter(toks), 4096, 1024))
    flat = [t for b in batches for t in b]
    assert flat == toks                       # order + completeness
    for b in batches:
        widest = max(len(t) for t in b)
        assert len(b) * min(_bucket(widest), 1024) <= 4096 or len(b) == 1


def test_pack_short_sentences_pack_wide():
    toks = [[1, 2, 3]] * 64                   # bucket 16 -> 256 rows/4k
    batches = list(pack_by_tokens(iter(toks), 4096, 1024))
    assert len(batches) == 1
    assert len(batches[0]) == 64


def test_pack_long_sentences_go_alone():
    toks = [list(range(900))] * 3             # bucket 1024 capped
    batches = list(pack_by_tokens(iter(toks), 1024, 1024))
    assert [len(b) for b in batches] == [1, 1, 1]
