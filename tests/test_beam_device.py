"""On-device batched beam search vs the exact host prefix search."""

import numpy as np
import jax
import jax.numpy as jnp

from haloop_tpu.ops.beam import ctc_beam_search_decode_logits
from haloop_tpu.ops.beam_device import ctc_beam_search_batched


def host_topk(log_probs, K):
    return ctc_beam_search_decode_logits(log_probs, beam_width=K, topk=K)


def test_matches_host_exactly():
    rng = np.random.default_rng(0)
    N, T, V, K = 3, 12, 6, 4
    logits = rng.normal(size=(N, T, V)).astype(np.float32) * 1.5
    lp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), -1))
    lengths = np.array([12, 9, 5], np.int32)

    prefixes, lens, scores = ctc_beam_search_batched(
        jnp.asarray(lp), jnp.asarray(lengths), beam_width=K)
    prefixes = np.asarray(prefixes)
    lens = np.asarray(lens)
    scores = np.asarray(scores)

    for n in range(N):
        want = host_topk(lp[n, :lengths[n]], K)
        got = [(tuple(prefixes[n, j, :lens[n, j]]), scores[n, j])
               for j in range(K) if lens[n, j] >= 0]
        # top-1 must match exactly, scores to fp tolerance
        assert got[0][0] == want[0][0], (n, got[0], want[0])
        np.testing.assert_allclose(got[0][1], want[0][1], rtol=1e-4)
        # every surviving device beam must appear in the host beam set
        want_dict = {p: s for p, s in want}
        for p, s in got:
            if s <= -1e29:
                continue
            assert p in want_dict, (n, p)
            np.testing.assert_allclose(s, want_dict[p], rtol=1e-4,
                                       atol=1e-5)


def test_beam_scores_equal_lattice_likelihoods():
    """Each surviving device beam's score must equal the exact CTC
    lattice likelihood of its labeling."""
    from haloop_tpu.ops.ctc import ctc_forward_score
    rng = np.random.default_rng(1)
    N, T, V, K = 2, 10, 5, 16
    logits = rng.normal(size=(N, T, V)).astype(np.float32) * 2
    lp = jax.nn.log_softmax(jnp.asarray(logits), -1)
    lengths = jnp.array([10, 7], jnp.int32)
    prefixes, lens, scores = ctc_beam_search_batched(lp, lengths,
                                                     beam_width=K)
    prefixes = np.asarray(prefixes)
    lens = np.asarray(lens)
    scores = np.asarray(scores)
    assert scores[:, 0].max() <= 1e-6  # log probs
    for n in range(N):
        for j in range(K):
            L = int(lens[n, j])
            if L <= 0 or scores[n, j] < -1e29:
                continue
            tg = jnp.asarray(prefixes[n:n + 1, j, :L].astype(np.int32))
            lattice = -float(ctc_forward_score(
                jnp.swapaxes(lp[n:n + 1, :], 0, 1), tg,
                lengths[n:n + 1], jnp.array([L]))[0])
            # beam mass <= full lattice mass (beam may have pruned
            # some alignments); top beams on short inputs match tightly
            assert scores[n, j] <= lattice + 1e-4

    # unpruned regime: with the beam wide enough to hold EVERY distinct
    # prefix (V=3, T=3 -> <= 15 prefixes <= K=16), every beam's score
    # must EQUAL its exact lattice likelihood — the two-sided check the
    # bound above cannot give
    rng = np.random.default_rng(3)
    T2, V2, K2 = 3, 3, 16
    lp2 = np.asarray(jax.nn.log_softmax(
        jnp.asarray(rng.normal(size=(1, T2, V2)).astype(np.float32) * 2),
        -1))
    l2 = jnp.array([T2], jnp.int32)
    pf2, ln2, sc2 = ctc_beam_search_batched(jnp.asarray(lp2), l2,
                                            beam_width=K2)
    pf2, ln2, sc2 = np.asarray(pf2), np.asarray(ln2), np.asarray(sc2)
    checked = 0
    for j in range(K2):
        L = int(ln2[0, j])
        if L <= 0 or sc2[0, j] < -1e29:
            continue
        tg = jnp.asarray(pf2[0:1, j, :L].astype(np.int32))
        lattice = -float(ctc_forward_score(
            jnp.swapaxes(jnp.asarray(lp2[0:1]), 0, 1), tg,
            l2, jnp.array([L]))[0])
        np.testing.assert_allclose(sc2[0, j], lattice, rtol=1e-4,
                                   atol=1e-4)
        checked += 1
    assert checked >= 3, checked
