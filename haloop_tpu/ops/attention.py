"""Scaled dot-product attention: a pure-JAX reference with optional
entropy measurement, plus the dispatch point for the fused Pallas flash
kernel.

Mask semantics follow the reference (ha/transformer.py:413-430): ``mask``
is boolean with True = DISALLOWED (masked out). ``causal`` applies a
lower-triangular constraint shifted by the KV-cache offset.

All softmax math runs in fp32 regardless of input dtype (bf16-safe).
"""

import math
from functools import partial

import jax
import jax.numpy as jnp


def attend(q, k, v, mask=None, measure_entropy=False):
    """Materialized attention.

    q: (N, h, T, d); k, v: (N, h, S, d); mask: broadcastable (..., T, S),
    True = masked out. Returns (out (N, h, T, d), entropy scalar).
    """
    d = k.shape[-1]
    qk = jnp.einsum("...td,...sd->...ts", q, k,
                    preferred_element_type=jnp.float32) / math.sqrt(d)
    if mask is not None:
        qk = jnp.where(mask, -jnp.inf, qk)
    att = jax.nn.softmax(qk, axis=-1)
    if measure_entropy:
        att_entropy = jnp.mean(jnp.sum(-att * jnp.log(att + 1e-8), axis=-1))
    else:
        att_entropy = jnp.float32(-jnp.inf)
    out = jnp.einsum("...ts,...sd->...td", att.astype(v.dtype), v,
                     preferred_element_type=jnp.float32).astype(v.dtype)
    return out, att_entropy


def causal_mask(T, S, t0=0):
    """True = masked. Query t (at absolute position t0+t) may see keys <= t0+t."""
    rows = t0 + jnp.arange(T)[:, None]
    cols = jnp.arange(S)[None, :]
    return cols > rows


def mha(q, k, v, mask=None, causal=False, t0=0, measure_entropy=False,
        use_flash="auto"):
    """Dispatching attention entry point used by all models.

    On TPU, non-entropy calls route to the fused Pallas flash kernel
    (ops/flash.py) when shapes allow; otherwise the fused-by-XLA reference
    path runs (still one HBM round trip on short sequences).
    """
    T, S = q.shape[-2], k.shape[-2]
    if causal and mask is None:
        mask = causal_mask(T, S, t0=t0)
    if not measure_entropy and use_flash != "never":
        from haloop_tpu.ops.flash import flash_attention_or_none
        out = flash_attention_or_none(q, k, v, mask=mask)
        if out is not None:
            return out, jnp.float32(-jnp.inf)
    return attend(q, k, v, mask=mask, measure_entropy=measure_entropy)
