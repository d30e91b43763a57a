"""Scaled dot-product attention: a pure-JAX reference with optional
entropy measurement, plus the dispatch point for the fused Pallas flash
kernel.

Mask semantics follow the reference (ha/transformer.py:413-430): ``mask``
is boolean with True = DISALLOWED (masked out). ``causal`` applies a
lower-triangular constraint shifted by the KV-cache offset.

All softmax math runs in fp32 regardless of input dtype (bf16-safe).
"""

import math

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
        # finite mask value: with -inf a FULLY-masked row (kv_length 0,
        # padded batch entry) softmaxes to NaN and NaN*0 poisons any
        # downstream mean; -1e30 yields a harmless uniform row instead
        qk = jnp.where(mask, -1e30, qk)
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


def mha(q, k, v, mask=None, causal=False, t0=0, kv_lengths=None,
        segment_ids=None, measure_entropy=False, use_flash="auto"):
    """Dispatching attention entry point used by all models.

    Prefer expressing masking semantically: ``causal`` (+ cache offset
    ``t0``), per-batch ``kv_lengths``, and per-token ``segment_ids``
    (packed rows, block-diagonal) — these route to the fused Pallas
    flash kernels on TPU. An explicit ``mask`` tensor (or entropy
    measurement) falls back to the materialized XLA path.
    """
    T, S = q.shape[-2], k.shape[-2]
    if (segment_ids is not None and mask is None and kv_lengths is None
            and not measure_entropy and use_flash != "never" and T == S
            and t0 == 0 and _flash_worthwhile(q, k, causal)):
        from haloop_tpu.ops.flash import flash_attention_packed
        out = flash_attention_packed(q, k, v, segment_ids, causal)
        return out, jnp.float32(-jnp.inf)
    if segment_ids is not None:
        seg = (segment_ids[:, None, :, None] !=
               segment_ids[:, None, None, :])
        mask = seg if mask is None else (mask | seg)
    if (mask is None and not measure_entropy and use_flash != "never"
            and _flash_worthwhile(q, k, causal)):
        from haloop_tpu.ops.flash import flash_attention
        if kv_lengths is None:
            kv_lengths = jnp.full((q.shape[0],), S, jnp.int32)
        out = flash_attention(q, k, v, kv_lengths.astype(jnp.int32),
                              causal, t0)
        return out, jnp.float32(-jnp.inf)
    if kv_lengths is not None:
        pad = (jnp.arange(S)[None, :] >=
               kv_lengths[:, None])[:, None, None, :]
        mask = pad if mask is None else (mask | pad)
    if causal:
        cmask = causal_mask(T, S, t0=t0)
        mask = cmask if mask is None else (mask | cmask)
    return attend(q, k, v, mask=mask, measure_entropy=measure_entropy)


def _flash_worthwhile(q, k, causal=False):
    """Use the Pallas kernel only on TPU and for long-enough sequences
    (short ones are faster through plain XLA fusion). Measured on v5e
    with the auto block sizes AND bf16 MXU feeds (r3 — the floors moved
    once the kernels stopped pre-casting to fp32): causal wins from
    T=256; non-causal wins from T~300 — forward at the e6ctc encoder
    shape (B=24 h=12 d=64, T=304): flash 1.98 vs XLA 2.73 ms, and the
    FULL e6ctc-d4 train step (fwd+bwd through the kernels) in a
    back-to-back A/B: 22.1 vs 24.6 ms/step. XLA stays ahead at <=256
    (1.5-2.4 vs 2.1-2.5 ms). Tiny-query shapes (decoder
    cross-attention, U~24) stay on the fused XLA path.
    HALOOP_FLASH_NC_FLOOR overrides for A/B measurements.

    Dispatch rides ops.dispatch.use_pallas: TPU only, and on a
    multi-device GSPMD trace the kernel stays OFF unless inside a
    shard_map marked force_local — a pallas_call has no partitioning
    rule, so GSPMD would all-gather the sharded operands and run the
    attention replicated on every chip."""
    import os
    from haloop_tpu.ops import dispatch
    if not dispatch.use_pallas():
        return False
    try:
        # unlike the lattice kernels, flash has no interpret fallback
        # when force-enabled off-TPU (HALOOP_KERNELS=1 on CPU drives
        # the lattice tests only)
        if jax.default_backend() != "tpu":
            return False
    except Exception:
        return False
    floor = 256 if causal else int(
        os.environ.get("HALOOP_FLASH_NC_FLOOR", "300"))
    return q.shape[-2] >= floor and k.shape[-2] >= floor
