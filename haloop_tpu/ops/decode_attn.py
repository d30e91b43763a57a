"""Fused single-token decode attention over a FLAT (B, S, E) KV cache.

The serving decode step (hat, hat --batch, hap-free generate —
reference ha/attention.py:284-325 is the python streaming loop this
replaces) spends its time reading the KV cache. Two XLA behaviors make
the stock formulation pay far more than the cache's logical bytes
(measured in scripts/exp_decode_kv.py / exp_decode_hlo.py, GPT-2S
B=64: 3.83 ms/step vs a ~1.05 ms bandwidth ideal):

  1. a head-split (B, H, S, D) scan carry gets layout
     {3,1,0,2:T(8,128)} — the (H, D) = (12, 64) minor pair is tile-
     padded to (16, 128), i.e. 2.66x physical bytes on every read;
  2. the cache is both attended over (read) and dynamic-update-sliced
     (written) in the same scan body, so XLA materializes full-buffer
     update fusions instead of updating in place.

This kernel fixes both by construction: the cache is stored FLAT as
(B, S, E) — minor dim E = n_embd is a multiple of the 128-lane tile,
so the layout is exactly the logical bytes — and the new token's K/V
row is merged in-kernel (the aliased output writes back through the
same buffer, no separate update pass over the carry).

Per-head attention over a flat cache without reshapes (D = E/H = 64
is smaller than the 128-lane tile, so (S, H, D) reshapes in-kernel
would re-introduce padding) uses a block-diagonal masked matmul:

    scores[s, h] = sum_e k[s, e] * qM[e, h]   qM[e, h] = q[e]-if-head(e)==h
    pexp[s, e]   = probs[s, head(e)]          via probs @ Mpv (H, E) 0/1
    y[e]         = sum_s pexp[s, e] * v[s, e]

The h-columns the MXU pads to 128 lanes are zero — redundant FLOPs on
a bandwidth-bound step. qM is built by the caller (tiny, fuses into
the surrounding XLA); Mpv is a constant.

Semantics (must match gpt._attn's past branch at T == 1):
  - rows s with  starts[b] <= s <= length  are attended (the new
    token's own K/V included — it is merged before the softmax);
  - softmax in f32; y accumulated in f32, cast to the cache dtype.

Used by models/gpt.py when dispatch.use_pallas() and the cache fits
VMEM; the pure-XLA fallback there computes the identical values (CPU
tests pin interpret-mode parity: tests/test_decode_attn.py).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np


def head_matrices(n_head, head_dim, dtype=jnp.bfloat16):
    """(Mqk (E, H), Mpv (H, E)) 0/1 block-diagonal expanders."""
    eye = np.eye(n_head, dtype=np.float32)
    mqk = np.repeat(eye, head_dim, axis=0)          # (E, H)
    return jnp.asarray(mqk, dtype), jnp.asarray(mqk.T, dtype)


def _kernel(meta_ref, qm_ref, kn_ref, vn_ref, kc_ref, vc_ref, mpv_ref,
            y_ref, ko_ref, vo_ref, *, scale):
    import jax.experimental.pallas as pl
    b = pl.program_id(0)
    L = meta_ref[0]
    start = meta_ref[1 + b]

    S = kc_ref.shape[1]
    rows = jax.lax.broadcasted_iota(jnp.int32, (S, 1), 0)
    is_new = rows == L                                    # (S, 1)

    # merge the new token's K/V row, write back through the alias
    k = jnp.where(is_new, kn_ref[0], kc_ref[0])           # (S, E)
    v = jnp.where(is_new, vn_ref[0], vc_ref[0])
    ko_ref[...] = k[None]
    vo_ref[...] = v[None]

    # scores: one matmul consuming the flat layout directly
    s = jax.lax.dot_general(
        k, qm_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)               # (S, H)
    valid = (rows <= L) & (rows >= start)                 # (S, 1)
    s = jnp.where(valid, s * scale, -jnp.inf)

    m = jnp.max(s, axis=0, keepdims=True)                 # (1, H)
    e = jnp.exp(s - m)
    l = jnp.sum(e, axis=0, keepdims=True)                 # (1, H)
    p = (e / l).astype(v.dtype)                           # (S, H)

    # expand probs to lanes: pexp[s, e] = p[s, head(e)]
    pexp = jax.lax.dot_general(
        p, mpv_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)               # (S, E)
    y = jnp.sum(pexp * v.astype(jnp.float32), axis=0, keepdims=True)
    y_ref[...] = y[None].astype(y_ref.dtype)


@functools.partial(jax.jit, static_argnames=("n_head", "interpret"))
def decode_attend_update(q, k_new, v_new, k_cache, v_cache, length,
                         starts=None, *, n_head, interpret=False):
    """One decode step of cached attention, fused.

    q, k_new, v_new: (B, E) — the new token's projections, flat
    head-major (rotary already applied); k_cache, v_cache: (B, S, E);
    length: scalar int32 fill level (the new row's index); starts:
    optional (B,) int32 first-valid row per batch row (left-padded
    batches). Returns (y (B, E), k_cache', v_cache') with the caches
    updated at row ``length`` (buffers donated/aliased in place).
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, S, E = k_cache.shape
    H = n_head
    assert E % H == 0
    scale = 1.0 / float(np.sqrt(E // H))

    if starts is None:
        starts = jnp.zeros((B,), jnp.int32)
    meta = jnp.concatenate([jnp.asarray(length, jnp.int32).reshape(1),
                            starts.astype(jnp.int32)])

    mqk, mpv = head_matrices(H, E // H, k_cache.dtype)
    # qM[b, e, h]: q masked to its head's rows — fuses into XLA around
    # the kernel (B*E*H elements, tiny next to the cache read)
    qm = (q[:, :, None] * mqk[None]).astype(k_cache.dtype)

    # row operands/outputs ride as (B, 1, E): a (1, E) block over a
    # (B, E) array violates Mosaic's last-two-dims rule for B > 1
    # (block dim 1 neither 8-divisible nor == B) — observed as a
    # lowering ValueError on real TPU at B = 16, invisible to
    # interpret mode. (1, 1, E) blocks are always legal.
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, E, H), lambda b, m: (b, 0, 0)),      # qM
            pl.BlockSpec((1, 1, E), lambda b, m: (b, 0, 0)),      # k_new
            pl.BlockSpec((1, 1, E), lambda b, m: (b, 0, 0)),      # v_new
            pl.BlockSpec((1, S, E), lambda b, m: (b, 0, 0)),      # k_cache
            pl.BlockSpec((1, S, E), lambda b, m: (b, 0, 0)),      # v_cache
            pl.BlockSpec((H, E), lambda b, m: (0, 0)),            # Mpv
        ],
        out_specs=[
            pl.BlockSpec((1, 1, E), lambda b, m: (b, 0, 0)),      # y
            pl.BlockSpec((1, S, E), lambda b, m: (b, 0, 0)),
            pl.BlockSpec((1, S, E), lambda b, m: (b, 0, 0)),
        ],
    )
    y, ko, vo = pl.pallas_call(
        functools.partial(_kernel, scale=scale),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, 1, E), k_cache.dtype),
            jax.ShapeDtypeStruct((B, S, E), k_cache.dtype),
            jax.ShapeDtypeStruct((B, S, E), v_cache.dtype),
        ],
        # indices count ALL operands incl. the scalar-prefetch arg:
        # (0 meta, 1 qM, 2 k_new, 3 v_new, 4 k_cache, 5 v_cache, 6 Mpv)
        input_output_aliases={4: 1, 5: 2},
        interpret=interpret,
    )(meta, qm, k_new[:, None, :], v_new[:, None, :], k_cache, v_cache,
      mpv)
    return y[:, 0, :], ko, vo


# Finite mask value for the gridded kernel: exp(_NEG - m) == 0 in f32
# for any finite m of realistic score magnitude, and a FULLY-masked
# block leaves the running max at _NEG so its unit-weight garbage
# contributions are killed by alpha = exp(_NEG - m_real) = 0 at the
# first block with a real score. (-inf would make exp(-inf - -inf)
# NaN for blocks entirely outside [starts, length].)
_NEG = -1e30


def _kernel_gridded(meta_ref, qm_ref, kn_ref, vn_ref, kc_ref, vc_ref,
                    mpv_ref, y_ref, ko_ref, vo_ref,
                    m_scr, l_scr, acc_scr, *, scale, n_sb):
    import jax.experimental.pallas as pl
    b = pl.program_id(0)
    sb = pl.program_id(1)
    L = meta_ref[0]
    start = meta_ref[1 + b]

    Sb = kc_ref.shape[1]
    rows = sb * Sb + jax.lax.broadcasted_iota(jnp.int32, (Sb, 1), 0)
    is_new = rows == L                                    # (Sb, 1)

    # merge the new token's K/V row (in whichever S-block holds it),
    # write every block back through the alias
    k = jnp.where(is_new, kn_ref[0], kc_ref[0])           # (Sb, E)
    v = jnp.where(is_new, vn_ref[0], vc_ref[0])
    ko_ref[...] = k[None]
    vo_ref[...] = v[None]

    # Mpv is 0/1 — exact in bf16, so the f32 view is an exact selector
    mpvf = mpv_ref[...].astype(jnp.float32)               # (H, E)

    s = jax.lax.dot_general(
        k, qm_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)               # (Sb, H)
    valid = (rows <= L) & (rows >= start)                 # (Sb, 1)
    s = jnp.where(valid, s * scale, _NEG)

    @pl.when(sb == 0)
    def _init():
        m_scr[...] = jnp.full(m_scr.shape, _NEG, jnp.float32)
        l_scr[...] = jnp.zeros(l_scr.shape, jnp.float32)
        acc_scr[...] = jnp.zeros(acc_scr.shape, jnp.float32)

    m_prev = m_scr[...]                                   # (1, H)
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=0, keepdims=True))
    alpha = jnp.exp(m_prev - m_new)                       # (1, H)
    e = jnp.exp(s - m_new)                                # (Sb, H) <= 1

    m_scr[...] = m_new
    l_scr[...] = l_scr[...] * alpha + jnp.sum(e, axis=0, keepdims=True)

    # expand head-indexed weights to lanes: x[., e] = x[., head(e)]
    eexp = jax.lax.dot_general(
        e, mpvf, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)               # (Sb, E)
    aexp = jax.lax.dot_general(
        alpha, mpvf, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)               # (1, E)
    contrib = jnp.sum(eexp * v.astype(jnp.float32), axis=0,
                      keepdims=True)                      # (1, E)
    acc_scr[...] = acc_scr[...] * aexp + contrib

    @pl.when(sb == n_sb - 1)
    def _final():
        lexp = jax.lax.dot_general(
            l_scr[...], mpvf, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)           # (1, E)
        y_ref[...] = (acc_scr[...] / lexp)[None].astype(y_ref.dtype)


def pick_s_block(S, E, itemsize, budget=4 * 2**20):
    """Largest power-of-two S-block (>= 128) dividing S whose K + V
    blocks fit ``budget`` bytes of VMEM; None if S has no such divisor
    (then the caller keeps the XLA fallback)."""
    for cand in (2048, 1024, 512, 256, 128):
        if S % cand == 0 and 2 * cand * E * itemsize <= budget:
            return cand
    return None


@functools.partial(jax.jit,
                   static_argnames=("n_head", "block_s", "interpret"))
def decode_attend_update_gridded(q, k_new, v_new, k_cache, v_cache,
                                 length, starts=None, *, n_head, block_s,
                                 interpret=False):
    """decode_attend_update for caches too large to hold (1, S, E) in
    VMEM: the S axis is gridded into ``block_s``-row blocks and the
    softmax runs online (flash-decode style), carrying running
    (max, denom, accumulator) in VMEM scratch across the sequential
    inner grid axis. Semantics identical to decode_attend_update.
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, S, E = k_cache.shape
    H = n_head
    assert E % H == 0 and S % block_s == 0
    n_sb = S // block_s
    scale = 1.0 / float(np.sqrt(E // H))

    if starts is None:
        starts = jnp.zeros((B,), jnp.int32)
    meta = jnp.concatenate([jnp.asarray(length, jnp.int32).reshape(1),
                            starts.astype(jnp.int32)])

    mqk, mpv = head_matrices(H, E // H, k_cache.dtype)
    qm = (q[:, :, None] * mqk[None]).astype(k_cache.dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, n_sb),
        in_specs=[
            pl.BlockSpec((1, E, H), lambda b, s, m: (b, 0, 0)),    # qM
            pl.BlockSpec((1, 1, E), lambda b, s, m: (b, 0, 0)),    # k_new
            pl.BlockSpec((1, 1, E), lambda b, s, m: (b, 0, 0)),    # v_new
            pl.BlockSpec((1, block_s, E), lambda b, s, m: (b, s, 0)),
            pl.BlockSpec((1, block_s, E), lambda b, s, m: (b, s, 0)),
            pl.BlockSpec((H, E), lambda b, s, m: (0, 0)),          # Mpv
        ],
        out_specs=[
            pl.BlockSpec((1, 1, E), lambda b, s, m: (b, 0, 0)),    # y
            pl.BlockSpec((1, block_s, E), lambda b, s, m: (b, s, 0)),
            pl.BlockSpec((1, block_s, E), lambda b, s, m: (b, s, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, H), jnp.float32),       # running max
            pltpu.VMEM((1, H), jnp.float32),       # running denom
            pltpu.VMEM((1, E), jnp.float32),       # running accumulator
        ],
    )
    y, ko, vo = pl.pallas_call(
        functools.partial(_kernel_gridded, scale=scale, n_sb=n_sb),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, 1, E), k_cache.dtype),
            jax.ShapeDtypeStruct((B, S, E), k_cache.dtype),
            jax.ShapeDtypeStruct((B, S, E), v_cache.dtype),
        ],
        # (0 meta, 1 qM, 2 k_new, 3 v_new, 4 k_cache, 5 v_cache, 6 Mpv)
        input_output_aliases={4: 1, 5: 2},
        interpret=interpret,
    )(meta, qm, k_new[:, None, :], v_new[:, None, :], k_cache, v_cache,
      mpv)
    return y[:, 0, :], ko, vo


def decode_attend_reference(q, k_new, v_new, k_cache, v_cache, length,
                            starts=None, *, n_head):
    """Pure-XLA oracle with identical semantics (head-split attend)."""
    B, S, E = k_cache.shape
    H, D = n_head, E // n_head
    kc = jax.lax.dynamic_update_slice(k_cache, k_new[:, None, :],
                                      (0, length, 0))
    vc = jax.lax.dynamic_update_slice(v_cache, v_new[:, None, :],
                                      (0, length, 0))
    kh = kc.reshape(B, S, H, D).swapaxes(1, 2)
    vh = vc.reshape(B, S, H, D).swapaxes(1, 2)
    qh = q.reshape(B, 1, H, D).swapaxes(1, 2)
    cols = jnp.arange(S)[None, :]
    valid = cols <= length
    if starts is not None:
        valid = valid & (cols >= starts[:, None])
    else:
        valid = jnp.broadcast_to(valid, (B, S))
    s = jnp.einsum("bhtd,bhsd->bhts", qh, kh,
                   preferred_element_type=jnp.float32) / np.sqrt(D)
    s = jnp.where(valid[:, None, None, :], s, -jnp.inf)
    p = jax.nn.softmax(s, axis=-1)
    y = jnp.einsum("bhts,bhsd->bhtd", p.astype(vh.dtype), vh,
                   preferred_element_type=jnp.float32).astype(vh.dtype)
    return y.swapaxes(1, 2).reshape(B, E), kc, vc
