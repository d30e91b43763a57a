"""Fused Star-CTC Pallas kernels vs the lax.scan oracle
(ops/star.star_ctc_forward_score, itself tested against the reference):
values AND gradients, over penalties, ragged lengths, and batch sizes.
Kernels run in interpret mode on CPU."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from haloop_tpu.ops.star import star_ctc_forward_score
from haloop_tpu.ops.star_pallas import star_ctc_loss_pallas


def _data(T=25, N=3, V=12, S=4, seed=0):
    rng = np.random.default_rng(seed)
    lp = jax.nn.log_softmax(jnp.asarray(
        rng.normal(size=(T, N, V)).astype(np.float32)), -1)
    tg = jnp.asarray(rng.integers(1, V, (N, S)).astype(np.int32))
    il = jnp.asarray(rng.integers(max(T // 2, 4 * S + 3), T + 1, N)
                     .astype(np.int32))
    tl = jnp.asarray(rng.integers(1, S + 1, N).astype(np.int32))
    return lp, tg, il, tl


@pytest.mark.parametrize("penalty", [0.0, -0.5, -2.0])
def test_star_pallas_values(penalty):
    lp, tg, il, tl = _data()
    want = np.asarray(star_ctc_forward_score(lp, tg, il, tl,
                                             star_penalty=penalty))
    got = np.asarray(star_ctc_loss_pallas(lp, tg, il, tl,
                                          star_penalty=penalty))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-4)


def test_star_pallas_grads():
    lp, tg, il, tl = _data(T=19, N=2, V=9, S=3, seed=1)

    def f_scan(lp):
        return jnp.sum(star_ctc_forward_score(lp, tg, il, tl,
                                              star_penalty=-0.5))

    def f_pallas(lp):
        return jnp.sum(star_ctc_loss_pallas(lp, tg, il, tl,
                                            star_penalty=-0.5))

    gw = np.asarray(jax.grad(f_scan)(lp))
    gg = np.asarray(jax.grad(f_pallas)(lp))
    np.testing.assert_allclose(gg, gw, rtol=1e-3, atol=2e-4)


def test_star_pallas_full_lengths():
    # every frame used, full targets: exercises the t==len-1 latch at
    # the very last tile row
    lp, tg, il, tl = _data(T=16, N=2, V=8, S=3, seed=2)
    il = jnp.full_like(il, 16)
    tl = jnp.full_like(tl, 3)
    want = np.asarray(star_ctc_forward_score(lp, tg, il, tl,
                                             star_penalty=-1.0))
    got = np.asarray(star_ctc_loss_pallas(lp, tg, il, tl,
                                          star_penalty=-1.0))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-4)


def test_star_dispatch_in_loss(monkeypatch):
    """temporal_classifier_loss with star_penalty routes through the
    kernel under forced dispatch and matches the scan path."""
    from haloop_tpu.models import recognizer as RE

    lp, tg, il, tl = _data(T=15, N=2, V=8, S=3, seed=3)
    p = RE.temporal_classifier_init(jax.random.PRNGKey(0), 6, 8)
    feats = jax.random.normal(jax.random.PRNGKey(1), (2, 15, 6))

    monkeypatch.setenv("HALOOP_KERNELS", "0")
    want, _ = RE.temporal_classifier_loss(p, feats, tg, il, tl,
                                          star_penalty=-0.5)
    monkeypatch.setenv("HALOOP_KERNELS", "1")
    got, _ = RE.temporal_classifier_loss(p, feats, tg, il, tl,
                                         star_penalty=-0.5)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)
