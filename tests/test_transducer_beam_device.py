"""On-device monotonic transducer beam search: K=1 equals a monotonic
greedy python oracle; larger K scores dominate K=1."""

import numpy as np
import jax
import jax.numpy as jnp

from haloop_tpu.models import recognizer as RE
from haloop_tpu.models import rnn as R
from haloop_tpu.nn.core import linear
from haloop_tpu.ops.beam_device import transducer_beam_search_batched


def monotonic_greedy_oracle(p, feats, T_n, lm_layers, lm_dim):
    """Per frame: pick max over {blank, labels}; a label advances the
    prediction net; at most one label per frame."""
    f = np.asarray(linear(p["classifier"], feats))
    state = R.decoder_init_hidden(lm_layers, 1, lm_dim)
    g, state = R.decoder_step(p["lm"], jnp.zeros((1,), jnp.int32), state,
                              num_layers=lm_layers)
    toks, score = [], 0.0
    for t in range(T_n):
        logp = np.asarray(jax.nn.log_softmax(jnp.asarray(f[t]) + g[0], -1))
        c = int(np.argmax(logp))
        score += float(logp[c])
        if c != 0:
            toks.append(c)
            g, state = R.decoder_step(p["lm"], jnp.array([c], jnp.int32),
                                      state, num_layers=lm_layers)
    return toks, score


def test_beam1_equals_monotonic_greedy():
    lm_layers, lm_dim, V, F = 1, 16, 10, 8
    p = RE.transducer_init(jax.random.PRNGKey(7), feat_dim=F, vocab_size=V,
                           lm_dim=lm_dim, lm_layers=lm_layers)
    rng = np.random.default_rng(0)
    N, T = 2, 9
    feats = jnp.asarray(rng.normal(size=(N, T, F)).astype(np.float32) * 2)
    lengths = jnp.array([9, 6], jnp.int32)

    tokens, ulens, scores = transducer_beam_search_batched(
        p, feats, lengths, beam_width=1, lm_layers=lm_layers,
        lm_dim=lm_dim)
    for n in range(N):
        want_toks, want_score = monotonic_greedy_oracle(
            p, feats[n], int(lengths[n]), lm_layers, lm_dim)
        got = [int(t) for t in
               np.asarray(tokens)[n, 0, :int(ulens[n, 0])]]
        assert got == want_toks, (n, got, want_toks)
        np.testing.assert_allclose(float(scores[n, 0]), want_score,
                                   rtol=1e-4)


def test_wider_beam_dominates():
    lm_layers, lm_dim, V, F = 1, 16, 10, 8
    p = RE.transducer_init(jax.random.PRNGKey(3), feat_dim=F, vocab_size=V,
                           lm_dim=lm_dim, lm_layers=lm_layers)
    rng = np.random.default_rng(1)
    N, T = 3, 12
    feats = jnp.asarray(rng.normal(size=(N, T, F)).astype(np.float32) * 2)
    lengths = jnp.array([12, 10, 7], jnp.int32)

    _, _, s1 = transducer_beam_search_batched(
        p, feats, lengths, beam_width=1, lm_layers=lm_layers, lm_dim=lm_dim)
    _, _, s4 = transducer_beam_search_batched(
        p, feats, lengths, beam_width=4, lm_layers=lm_layers, lm_dim=lm_dim)
    assert (np.asarray(s4)[:, 0] >= np.asarray(s1)[:, 0] - 1e-5).all()


def test_beam_entropy_stat():
    """return_entropy carries a per-beam entropy sum: negative (bits,
    transformer.py:311 sign convention), bounded by T * log2(V), and
    only frames < length contribute."""
    lm_layers, lm_dim, V, F = 1, 16, 10, 8
    p = RE.transducer_init(jax.random.PRNGKey(5), feat_dim=F, vocab_size=V,
                           lm_dim=lm_dim, lm_layers=lm_layers)
    rng = np.random.default_rng(2)
    N, T = 2, 9
    feats = jnp.asarray(rng.normal(size=(N, T, F)).astype(np.float32))
    lengths = jnp.array([9, 5], jnp.int32)

    toks, ulens, scores, ents = transducer_beam_search_batched(
        p, feats, lengths, beam_width=2, lm_layers=lm_layers,
        lm_dim=lm_dim, return_entropy=True)
    ents = np.asarray(ents)
    assert ents.shape == (N, 2)
    assert (ents <= 1e-6).all()
    assert (ents >= -np.asarray(lengths)[:, None] * np.log2(V) - 1e-6).all()
    # shorter utterance accumulates over fewer frames
    assert ents[1, 0] >= -5 * np.log2(V) - 1e-6
