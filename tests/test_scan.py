import numpy as np
import jax
import jax.numpy as jnp

from haloop_tpu.ops.scan import (
    scan, scanrec, scanrec_log, scanrec_sequential, scanrec_log_sequential)


def test_scan_matches_cumsum():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(5, 37)).astype(np.float32)
    np.testing.assert_allclose(scan(jnp.array(x), axis=1),
                               np.cumsum(x, axis=1), rtol=1e-5, atol=1e-5)


def test_scanrec_matches_sequential():
    rng = np.random.default_rng(1)
    w = rng.normal(size=(3, 29)).astype(np.float32) * 0.5
    b = rng.normal(size=(3, 29)).astype(np.float32)
    got = scanrec(jnp.array(w), jnp.array(b), axis=1)
    want = scanrec_sequential(jnp.array(w), jnp.array(b), axis=1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_scanrec_log_matches_sequential():
    rng = np.random.default_rng(2)
    w = rng.normal(size=(4, 53)).astype(np.float32)
    b = rng.normal(size=(4, 53)).astype(np.float32)
    got = scanrec_log(jnp.array(w), jnp.array(b), axis=1)
    want = scanrec_log_sequential(jnp.array(w), jnp.array(b), axis=1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_scanrec_log_matches_reference():
    from conftest import reference_module
    ref = reference_module("ha.scan")
    import torch
    rng = np.random.default_rng(3)
    # reference scanrec_log requires power-of-2 width
    w = rng.normal(size=(2, 32)).astype(np.float32)
    b = rng.normal(size=(2, 32)).astype(np.float32)
    want = ref.scanrec_log(torch.tensor(w), torch.tensor(b)).numpy()
    got = np.asarray(scanrec_log(jnp.array(w), jnp.array(b), axis=1))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_logsumexp_fully_masked_has_finite_grad():
    """A fully NEG_INF-masked slice must return a finite sentinel with
    ZERO (not NaN) gradients — the 1e-38 guard was denormal and XLA
    flushed it to zero, making the result -inf and the grad NaN."""
    from haloop_tpu.ops.semiring import NEG_INF, logsumexp

    x = jnp.full((3,), NEG_INF)
    v = float(logsumexp(x))
    assert np.isfinite(v) and v < -80, v
    g = jax.grad(lambda a: logsumexp(a))(x)
    assert np.isfinite(np.asarray(g)).all(), g
    # and ordinary inputs are untouched
    y = jnp.asarray([1.0, 2.0, 3.0])
    np.testing.assert_allclose(
        float(logsumexp(y)),
        float(jax.scipy.special.logsumexp(y)), rtol=1e-6)
