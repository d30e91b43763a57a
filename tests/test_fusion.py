"""Beam search with RNN-LM shallow fusion (BASELINE.json headline config)."""

import numpy as np
import jax
import jax.numpy as jnp

from haloop_tpu.models import recognizer as RE
from haloop_tpu.models import rnn as R
from haloop_tpu.nn.core import linear
from haloop_tpu.ops.beam import (
    RNNLMFusion, ctc_beam_search_decode_logits, transducer_beam_search)


def test_ctc_beam_lm_fusion_changes_ranking():
    rng = np.random.default_rng(0)
    T, V = 8, 6
    logits = rng.normal(size=(T, V)).astype(np.float32)
    log_probs = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), -1))

    lm_params = R.decoder_init(jax.random.PRNGKey(5), V, 16, 16, 1)
    lm = RNNLMFusion(lm_params, num_layers=1, hidden_dim=16)

    plain = ctc_beam_search_decode_logits(log_probs, beam_width=16, topk=3)
    fused = ctc_beam_search_decode_logits(log_probs, beam_width=16, topk=3,
                                          lm=lm, lm_weight=5.0)
    assert plain and fused
    # fusion with zero weight must reproduce the plain ranking
    zero = ctc_beam_search_decode_logits(log_probs, beam_width=16, topk=3,
                                         lm=lm, lm_weight=0.0)
    assert [p for p, _ in zero] == [p for p, _ in plain]

    # and at a heavy weight the LM must ACTUALLY move the ranking for
    # at least one input (a fusion path that silently drops the lm term
    # would match plain everywhere)
    changed = False
    for seed in range(8):
        rs = np.random.default_rng(seed)
        lp = np.asarray(jax.nn.log_softmax(
            jnp.asarray(rs.normal(size=(T, V)).astype(np.float32)), -1))
        a = ctc_beam_search_decode_logits(lp, beam_width=16, topk=3)
        b = ctc_beam_search_decode_logits(lp, beam_width=16, topk=3,
                                          lm=lm, lm_weight=5.0)
        changed |= [p for p, _ in a] != [p for p, _ in b]
    assert changed


def test_transducer_beam_contains_greedy():
    """With beam_width >= 1 the beam's best hypothesis must score at
    least as well as the greedy decode path."""
    lm_layers, lm_dim, V, F = 1, 16, 8, 8
    p = RE.transducer_init(jax.random.PRNGKey(1), feat_dim=F, vocab_size=V,
                           lm_dim=lm_dim, lm_layers=lm_layers)
    rng = np.random.default_rng(2)
    T = 6
    feats = jnp.asarray(rng.normal(size=(1, T, F)).astype(np.float32) * 2)
    f = np.asarray(linear(p["classifier"], feats))[0]

    greedy, glen, _, _ = RE.transducer_greedy_decode(
        p, feats, jnp.array([T]), lm_layers=lm_layers, lm_dim=lm_dim,
        max_symbols=6)
    greedy = tuple(int(t) for t in np.asarray(greedy)[0][:int(glen[0])])

    hyps = transducer_beam_search(f, p["lm"], lm_layers, lm_dim,
                                  beam_width=4, topk=4)
    assert hyps
    prefixes = [h[0] for h in hyps]
    # width-1 is a strict sub-search of width-4: its winner must appear
    # in the wider beam with a score the wider beam matches or beats
    # (blank-merging only ADDS mass), and the wider top-1 must dominate
    narrow = transducer_beam_search(f, p["lm"], lm_layers, lm_dim,
                                    beam_width=1, topk=1)
    (n_prefix, n_score), = narrow
    assert n_prefix in prefixes, (n_prefix, prefixes)
    wide_score = dict(hyps)[n_prefix]
    assert wide_score >= n_score - 1e-9, (wide_score, n_score)
    assert hyps[0][1] >= n_score - 1e-9
    # scores come back best-first
    assert all(a[1] >= b[1] for a, b in zip(hyps, hyps[1:]))


def test_transducer_beam_lm_fusion_runs():
    lm_layers, lm_dim, V, F = 1, 8, 8, 8
    p = RE.transducer_init(jax.random.PRNGKey(1), feat_dim=F, vocab_size=V,
                           lm_dim=lm_dim, lm_layers=lm_layers)
    rng = np.random.default_rng(2)
    f = rng.normal(size=(5, V)).astype(np.float32)
    lm_params = R.decoder_init(jax.random.PRNGKey(5), V, 8, 8, 1)
    lm = RNNLMFusion(lm_params, num_layers=1, hidden_dim=8)
    hyps = transducer_beam_search(f, p["lm"], lm_layers, lm_dim,
                                  beam_width=3, topk=2, lm=lm,
                                  lm_weight=0.5)
    assert hyps and all(np.isfinite(s) for _, s in hyps)
