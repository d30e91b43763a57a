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


def exhaustive_oracle(p, feats, T_n, lm_layers, lm_dim, V):
    """Enumerate EVERY monotonic action sequence (blank or one of V-1
    labels per frame) and return the max total log-prob. The prediction
    net depends only on the emitted prefix, so g is memoized per
    prefix."""
    import itertools
    f = np.asarray(linear(p["classifier"], feats))
    cache = {}

    def g_for(prefix):
        if prefix not in cache:
            if not prefix:
                state = R.decoder_init_hidden(lm_layers, 1, lm_dim)
                g, state = R.decoder_step(p["lm"], jnp.zeros((1,), jnp.int32),
                                          state, num_layers=lm_layers)
            else:
                g, state = cache[prefix[:-1]]
                g, state = R.decoder_step(
                    p["lm"], jnp.array([prefix[-1]], jnp.int32), state,
                    num_layers=lm_layers)
            cache[prefix] = (np.asarray(g), state)
        return cache[prefix][0]

    best = -np.inf
    for actions in itertools.product(range(V), repeat=T_n):
        prefix, score = (), 0.0
        for t, c in enumerate(actions):
            logp = np.asarray(jax.nn.log_softmax(
                jnp.asarray(f[t] + g_for(prefix)[0]), -1))
            score += float(logp[c])
            if c != 0:
                prefix = prefix + (c,)
        best = max(best, score)
    return best


def test_full_beam_equals_exhaustive_oracle():
    """With K >= (number of reachable action sequences) the beam is an
    exhaustive search: its best score must EQUAL the enumerated global
    max, and any narrower beam is dominated by it (the guaranteed form
    of 'wider is better' — pairwise K vs K' dominance is NOT a theorem
    of beam search and the old test relied on seed luck)."""
    lm_layers, lm_dim, V, F = 1, 8, 4, 6
    T = 4                       # 4^4 = 256 action sequences
    p = RE.transducer_init(jax.random.PRNGKey(3), feat_dim=F, vocab_size=V,
                           lm_dim=lm_dim, lm_layers=lm_layers)
    rng = np.random.default_rng(1)
    N = 2
    feats = jnp.asarray(rng.normal(size=(N, T, F)).astype(np.float32) * 2)
    lengths = jnp.array([T, T], jnp.int32)

    _, _, s_full = transducer_beam_search_batched(
        p, feats, lengths, beam_width=256, lm_layers=lm_layers,
        lm_dim=lm_dim)
    for n in range(N):
        want = exhaustive_oracle(p, feats[n], T, lm_layers, lm_dim, V)
        np.testing.assert_allclose(float(s_full[n, 0]), want, rtol=1e-4)

    for k in (1, 4):
        _, _, s_k = transducer_beam_search_batched(
            p, feats, lengths, beam_width=k, lm_layers=lm_layers,
            lm_dim=lm_dim)
        assert (np.asarray(s_full)[:, 0] >=
                np.asarray(s_k)[:, 0] - 1e-5).all()


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
