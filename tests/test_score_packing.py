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


def test_pack_segments_layout():
    from haloop_tpu.score import pack_segments
    toks = [[5, 6, 7], [8, 9], [10, 11, 12, 13], [14]]
    (inp, tgt, pos, seg, metas), = list(pack_segments(
        iter(toks), width=8, rows=2, bos=99))
    # row 0: [5,6,7][8,9] fill 5; row 1: [10..13][14]
    np.testing.assert_array_equal(tgt[0, :5], [5, 6, 7, 8, 9])
    np.testing.assert_array_equal(inp[0, :5], [99, 5, 6, 99, 8])
    np.testing.assert_array_equal(pos[0, :5], [0, 1, 2, 0, 1])
    np.testing.assert_array_equal(seg[0, :5], [1, 1, 1, 2, 2])
    assert (seg[0, 5:] == 0).all() and (tgt[0, 5:] == 0).all()
    np.testing.assert_array_equal(tgt[1, :5], [10, 11, 12, 13, 14])
    np.testing.assert_array_equal(seg[1, :5], [3, 3, 3, 3, 4])
    assert metas == [(0, 0, 3, toks[0]), (0, 3, 2, toks[1]),
                     (1, 0, 4, toks[2]), (1, 4, 1, toks[3])]


def test_packed_forward_matches_unpacked():
    """Block-diagonal attention + per-segment positions: every token's
    NLL in a packed row equals its NLL scored row-per-sentence."""
    import jax
    import jax.numpy as jnp
    from haloop_tpu.models import gpt as G
    from haloop_tpu.score import pack_segments

    for rotary in (0, 8):
        cfg = G.GPTConfig(block_size=32, vocab_size=64, n_layer=2,
                          n_head=2, n_embd=16, rotary_emb_dim=rotary)
        params = G.gpt_init(jax.random.PRNGKey(0), cfg)
        rng = np.random.default_rng(1)
        sents = [rng.integers(1, 64, n).tolist() for n in (5, 9, 3, 12, 7)]

        (inp, tgt, pos, seg, metas), = list(pack_segments(
            iter(sents), width=32, rows=2, bos=0))
        packed = G.forward_all(params, cfg, jnp.asarray(inp),
                               jnp.asarray(tgt), reduction='none',
                               positions=jnp.asarray(pos),
                               segment_ids=jnp.asarray(seg))
        packed = np.asarray(packed)

        for (r, start, n, toks) in metas:
            row_in = np.zeros((1, len(toks)), np.int32)
            row_in[0] = [0] + toks[:-1]
            row_tg = np.asarray([toks], np.int32)
            want = np.asarray(G.forward_all(
                params, cfg, jnp.asarray(row_in), jnp.asarray(row_tg),
                reduction='none'))[0]
            np.testing.assert_allclose(packed[r, start:start + n], want,
                                       rtol=1e-4, atol=1e-5)


def test_pack_by_tokens_bounded_programs():
    """On UNSORTED input, flush row counts must come from a log-sized
    set (power-of-two prefixes with carry) so the jitted scorer
    compiles O(log B x log W) programs, not one per flush size; order
    and coverage are exact and padded batches respect the budget."""
    from haloop_tpu.score import pack_by_tokens, _bucket

    rng = np.random.default_rng(0)
    lists = [list(range(rng.integers(1, 200))) for _ in range(2000)]
    batches = list(pack_by_tokens(lists, 4096, 1024))

    assert [t for b in batches for t in b] == lists
    for b in batches[:-1]:
        assert len(b) & (len(b) - 1) == 0, len(b)   # power of two
    shapes = set()
    for b in batches:
        w = min(_bucket(max(max(len(t) for t in b), 16)), 1024)
        assert len(b) * w <= 4096 or len(b) == 1
        shapes.add((len(b), w))
    assert len(shapes) <= 8, shapes
