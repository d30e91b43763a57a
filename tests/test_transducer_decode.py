"""Batched transducer greedy decode vs an obviously-correct python-loop
oracle built from the same single-step primitives."""

import numpy as np
import jax
import jax.numpy as jnp

from haloop_tpu.models import recognizer as RE
from haloop_tpu.models import rnn as R
from haloop_tpu.nn.core import linear


def oracle_decode(p, feats, T_n, lm_layers, lm_dim, max_symbols):
    f = np.asarray(linear(p["classifier"], feats))        # (T, V)
    state = R.decoder_init_hidden(lm_layers, 1, lm_dim)
    g, state = R.decoder_step(p["lm"], jnp.zeros((1,), jnp.int32), state,
                              num_layers=lm_layers)
    t, hyp = 0, []
    while t < T_n and len(hyp) < max_symbols:
        logp = np.asarray(jax.nn.log_softmax(
            jnp.asarray(f[t]) + g[0], -1))
        tok = int(np.argmax(logp))
        if tok == 0:
            t += 1
        else:
            hyp.append(tok)
            g, state = R.decoder_step(p["lm"], jnp.array([tok], jnp.int32),
                                      state, num_layers=lm_layers)
    return hyp


def test_transducer_greedy_matches_oracle():
    lm_layers, lm_dim, V, F = 1, 16, 12, 8
    p = RE.transducer_init(jax.random.PRNGKey(3), feat_dim=F, vocab_size=V,
                           lm_dim=lm_dim, lm_layers=lm_layers)
    rng = np.random.default_rng(0)
    N, T = 3, 12
    feats = jnp.asarray(rng.normal(size=(N, T, F)).astype(np.float32) * 2)
    lens = jnp.array([12, 8, 5], jnp.int32)

    hyps, out_lens, _, scores = RE.transducer_greedy_decode(
        p, feats, lens, lm_layers=lm_layers, lm_dim=lm_dim, max_symbols=10)
    hyps = np.asarray(hyps)
    out_lens = np.asarray(out_lens)

    for n in range(N):
        want = oracle_decode(p, feats[n], int(lens[n]), lm_layers, lm_dim,
                             max_symbols=10)
        assert out_lens[n] == len(want), (n, out_lens[n], want)
        np.testing.assert_array_equal(hyps[n, :len(want)], want)
