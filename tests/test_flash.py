"""Pallas flash attention: forward + kernelized backward parity against
the materialized reference (interpret mode on CPU)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from haloop_tpu.ops.flash import flash_attention, _reference


CASES = [(160, 160, False, 0), (300, 300, True, 0), (160, 288, True, 5)]


@pytest.mark.parametrize("T,S,causal,t0", CASES)
def test_forward_matches_reference(T, S, causal, t0):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(2, 2, T, 64)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(2, 2, S, 64)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(2, 2, S, 64)).astype(np.float32))
    kvl = jnp.array([S, max(S // 2, 1)], jnp.int32)
    out = flash_attention(q, k, v, kvl, causal, t0, True)
    ref = _reference(q, k, v, kvl, causal, t0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


@pytest.mark.parametrize("T,S,causal,t0", CASES)
def test_backward_kernels_match_reference(T, S, causal, t0):
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(size=(2, 2, T, 64)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(2, 2, S, 64)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(2, 2, S, 64)).astype(np.float32))
    kvl = jnp.array([S, max(S // 2, 1)], jnp.int32)

    def f_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, kvl, causal, t0, True) ** 2)

    def f_ref(q, k, v):
        return jnp.sum(_reference(q, k, v, kvl, causal, t0) ** 2)

    gf = jax.grad(f_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)
