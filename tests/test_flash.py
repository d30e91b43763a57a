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


@pytest.mark.parametrize("causal,blocks", [(True, None), (False, None),
                                           (True, 64)])
def test_packed_forward_matches_reference(causal, blocks):
    """flash_attention_packed (segment-blocked attention for hap --pack)
    vs the materialized reference with the same block-diagonal mask,
    including multi-block grids (bq=bk=64 over T=256)."""
    from haloop_tpu.ops.flash import flash_attention_packed
    from haloop_tpu.ops.attention import attend, causal_mask

    rng = np.random.default_rng(2)
    T = 256
    q = jnp.asarray(rng.normal(size=(2, 2, T, 64)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(2, 2, T, 64)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(2, 2, T, 64)).astype(np.float32))
    # packed rows: segments of mixed lengths, 0-padded tails
    seg = np.zeros((2, T), np.int32)
    for r in range(2):
        fill, s = 0, 1
        while fill < T - 16:
            n = min(int(rng.integers(8, 90)), T - 16 - fill)
            seg[r, fill:fill + n] = s
            fill += n
            s += 1
    seg = jnp.asarray(seg)

    out = flash_attention_packed(q, k, v, seg, causal, interpret=True,
                                 bq=blocks, bk=blocks)
    mask = (seg[:, None, :, None] != seg[:, None, None, :])
    if causal:
        mask = mask | causal_mask(T, T)
    ref, _ = attend(q, k, v, mask=mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5)


def test_packed_flash_backward_matches_reference():
    """flash_attention_packed now differentiates (reference-recompute
    VJP); grads must match the materialized segment-masked path."""
    from haloop_tpu.ops import flash as F

    rng = np.random.default_rng(0)
    N, H, T, D = 1, 2, 16, 8
    q, k, v = (jnp.asarray(rng.normal(size=(N, H, T, D)).astype(np.float32))
               for _ in range(3))
    seg = jnp.asarray(np.repeat([1, 2, 3, 0], 4)[None, :].astype(np.int32))

    def f_kernel(q, k, v):
        return F.flash_attention_packed(q, k, v, seg, True, True).sum()

    def f_ref(q, k, v):
        return F._packed_reference(q, k, v, seg, True).sum()

    g_kernel = jax.grad(f_kernel, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_kernel, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)
