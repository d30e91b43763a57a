import numpy as np
import pytest
import jax
import jax.numpy as jnp

from haloop_tpu.ops.star import star_ctc_forward_score, intersperse_stars


def random_problem(seed, T=20, N=3, C=7, S=3):
    rng = np.random.default_rng(seed)
    logits = rng.normal(size=(T, N, C)).astype(np.float32)
    log_probs = jax.nn.log_softmax(jnp.array(logits), axis=-1)
    targets = rng.integers(1, C, size=(N, S)).astype(np.int32)
    input_lengths = rng.integers(4 * S + 3, T + 1, size=(N,)).astype(np.int32)
    target_lengths = rng.integers(1, S + 1, size=(N,)).astype(np.int32)
    return log_probs, jnp.array(targets), jnp.array(input_lengths), jnp.array(target_lengths)


@pytest.mark.parametrize("seed,penalty", [(0, -0.5), (1, -2.0), (2, 0.0)])
def test_star_matches_reference(seed, penalty):
    from conftest import reference_module
    ref = reference_module("ha.star")
    import torch
    lp, tg, il, tl = random_problem(seed)
    want = ref.star_ctc_forward_score(
        torch.tensor(np.asarray(lp)), torch.tensor(np.asarray(tg)).long(),
        torch.tensor(np.asarray(il)).long(), torch.tensor(np.asarray(tl)).long(),
        star_penalty=penalty)
    got = star_ctc_forward_score(lp, tg, il, tl, star_penalty=penalty)
    np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=1e-4, atol=1e-4)


def test_intersperse_stars_normalized():
    # extended vocab must stay a distribution: star + blank sums to 1 over
    # {blank} ∪ stars-partition; total logsumexp of [probs, star] slices checks out
    rng = np.random.default_rng(5)
    lp = jax.nn.log_softmax(jnp.array(rng.normal(size=(4, 2, 6)).astype(np.float32)), -1)
    tg = jnp.array([[1, 2], [3, 4]], dtype=jnp.int32)
    star_lp, star_tg = intersperse_stars(lp, tg)
    V = 6
    assert star_lp.shape == (4, 2, 2 * V)
    assert star_tg.shape == (2, 5)
    # <star> equals logsumexp of non-blank
    want = jax.scipy.special.logsumexp(lp[..., 1:], axis=-1)
    np.testing.assert_allclose(np.asarray(star_lp[..., V]), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(star_tg[0]), [V + 1, 1, V + 2, 2, V])


def test_star_grad_finite():
    lp, tg, il, tl = random_problem(9)

    def loss(lp):
        return jnp.sum(star_ctc_forward_score(lp, tg, il, tl))

    g = jax.grad(loss)(lp)
    assert np.isfinite(np.asarray(g)).all()


def test_star_animate_matches_scan(capsys):
    """animate=True (eager trellis printing, ha/star.py:150-152) must
    produce the same scores as the lax.scan path."""
    import time
    from unittest import mock

    rng = np.random.default_rng(5)
    T, N, V, S = 3, 2, 6, 2
    logits = jnp.asarray(rng.normal(size=(T, N, V)))
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    targets = jnp.asarray(rng.integers(1, V, (N, S)))
    il = jnp.full((N,), T)
    tl = jnp.full((N,), S)

    ref = star_ctc_forward_score(log_probs, targets, il, tl)
    with mock.patch.object(time, "sleep"):
        ani = star_ctc_forward_score(log_probs, targets, il, tl,
                                     animate=True)
    np.testing.assert_allclose(np.asarray(ani), np.asarray(ref),
                               rtol=1e-6)
    out = capsys.readouterr().out
    assert out.count("\n") >= T    # one trellis frame per step
