"""Pallas lattice kernels (interpret mode) vs the lax.scan oracles:
CTC trellis fwd+bwd, RNN-T fused joint-lse fwd+bwd, fused lm_head CE,
and the dispatched model-level loss paths (HALOOP_KERNELS=1 forces the
kernels on CPU via interpret in these tests)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from haloop_tpu.ops.ctc import ctc_forward_score
from haloop_tpu.ops.ctc_pallas import ctc_loss_pallas
from haloop_tpu.ops.fused_ce import fused_ce_nll, reference_ce_nll
from haloop_tpu.ops.joint_pallas import pairwise_lse, pairwise_lse_reference


def test_ctc_pallas_matches_scan():
    rng = np.random.default_rng(0)
    T, N, C, U = 67, 5, 37, 9
    lp = jax.nn.log_softmax(
        jnp.asarray(rng.normal(size=(T, N, C)).astype(np.float32)), -1)
    tg = jnp.asarray(rng.integers(1, C, (N, U)).astype(np.int32))
    il = jnp.asarray(rng.integers(T // 2, T + 1, N).astype(np.int32))
    tl = jnp.asarray(rng.integers(1, U + 1, N).astype(np.int32))
    tl = tl.at[0].set(0)                       # empty-target edge case

    want = ctc_forward_score(lp, tg, il, tl)
    got = ctc_loss_pallas(lp, tg, il, tl, True)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    gw = jax.grad(lambda lp: jnp.sum(ctc_forward_score(lp, tg, il, tl)))(lp)
    gg = jax.grad(
        lambda lp: jnp.sum(ctc_loss_pallas(lp, tg, il, tl, True)))(lp)
    np.testing.assert_allclose(gg, gw, rtol=1e-3, atol=1e-3)


def test_pairwise_lse_matches_materialized():
    rng = np.random.default_rng(1)
    N, T, U1, V = 2, 45, 8, 130
    f = jnp.asarray(rng.normal(size=(N, T, V)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(N, U1, V)).astype(np.float32))
    np.testing.assert_allclose(pairwise_lse(f, g, True),
                               pairwise_lse_reference(f, g),
                               rtol=1e-5, atol=1e-5)
    dl = jnp.asarray(rng.normal(size=(N, T, U1)).astype(np.float32))
    g1 = jax.grad(lambda f, g: jnp.sum(pairwise_lse(f, g, True) * dl),
                  (0, 1))(f, g)
    g2 = jax.grad(
        lambda f, g: jnp.sum(pairwise_lse_reference(f, g) * dl),
        (0, 1))(f, g)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-4)


def test_fused_ce_matches_reference():
    rng = np.random.default_rng(2)
    N, D, V = 96, 64, 400
    x = jnp.asarray(rng.normal(size=(N, D)).astype(np.float32))
    w = jnp.asarray((rng.normal(size=(V, D)) * 0.05).astype(np.float32))
    t = jnp.asarray(rng.integers(0, V, N).astype(np.int32))
    np.testing.assert_allclose(fused_ce_nll(x, w, t, True),
                               reference_ce_nll(x, w, t),
                               rtol=1e-5, atol=1e-5)
    g1 = jax.grad(lambda x, w: jnp.sum(fused_ce_nll(x, w, t, True)),
                  (0, 1))(x, w)
    g2 = jax.grad(lambda x, w: jnp.sum(reference_ce_nll(x, w, t)),
                  (0, 1))(x, w)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-4)


def test_transducer_loss_fused_path(monkeypatch):
    """Model-level dispatch: transducer_loss with the fused joint equals
    the materialized joint path (values and grads)."""
    from haloop_tpu.models import recognizer as RE
    from haloop_tpu.ops import dispatch

    p = RE.transducer_init(jax.random.PRNGKey(0), feat_dim=16,
                           vocab_size=24, lm_dim=8, lm_layers=1)
    rng = np.random.default_rng(3)
    N, T, U = 2, 21, 6
    feats = jnp.asarray(rng.normal(size=(N, T, 16)).astype(np.float32))
    tg = jnp.asarray(rng.integers(1, 24, (N, U)).astype(np.int32))
    il = jnp.array([21, 15], jnp.int32)
    tl = jnp.array([6, 4], jnp.int32)

    def loss(p):
        l, _ = RE.transducer_loss(p, feats, tg, il, tl, lm_layers=1,
                                  lm_dim=8)
        return l

    # pin the LSTM prediction net to one implementation: this test
    # compares the transducer LATTICE paths at tight tolerance
    monkeypatch.setenv("HALOOP_LSTM_KERNEL", "0")
    monkeypatch.setenv("HALOOP_KERNELS", "0")
    want = float(loss(p))
    gw = jax.grad(loss)(p)

    # kernels auto-interpret off-TPU, so forcing dispatch runs the real
    # kernel code under the Pallas interpreter here
    monkeypatch.setenv("HALOOP_KERNELS", "1")
    got = float(loss(p))
    gg = jax.grad(loss)(p)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    for a, b in zip(jax.tree.leaves(gg), jax.tree.leaves(gw)):
        np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-4)


def test_ctc_tiles_respect_vmem_budget():
    """Long-target batches must shrink the batch tile instead of
    forcing an over-budget time tile (the old max(8, ...) floor made
    a 4.2MB block at S>=448 that failed Mosaic compilation)."""
    from haloop_tpu.ops.ctc_pallas import _tiles

    for N, T, S_ in [(128, 800, 2 * 448 + 1), (128, 1200, 2 * 600 + 1),
                     (48, 1200, 81), (8, 100, 9)]:
        TN, TT, SP = _tiles(N, T, S_)
        assert TN % 8 == 0 and TT % 8 == 0
        block = TN * TT * SP * 4
        assert block <= 5 * 2 ** 18 + TN * 8 * SP * 4, \
            (N, T, S_, TN, TT, SP, block)
