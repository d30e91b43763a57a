"""Fused blockwise (flash) attention as a Pallas TPU kernel.

Replaces the reference's flash-attn CUDA dependency and its in-repo
blockwise prototype (ha/transformer.py:374-410 ``attend_chunked`` is the
semantic spec). Design:

  * grid = (batch*heads, q_blocks, k_blocks); the k dimension is the
    sequential ("arbitrary") axis so Pallas double-buffers K/V block DMAs
    while the MXU works.
  * online softmax in fp32 scratch (m, l, acc) that persists across the
    k-axis grid steps; output written on the last k step.
  * masking by large-finite negatives (no -inf -> no NaNs; fully masked
    rows degrade to mean(v), matching standard flash implementations).
  * causal masking with a KV-cache offset ``t0`` plus per-batch
    ``kv_lengths`` padding masks — the two patterns models actually use.
  * backward = recompute with the XLA reference path via custom_vjp
    (correct everywhere; kernelized backward is a later optimization).

CPU/debug: ``interpret=True`` path exercised by tests; dispatch policy
(floors, single-device/shard_map gating) lives in ops/attention.py
``_flash_worthwhile`` + ops/dispatch.py ``use_pallas``.
"""

import functools
import math

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def _next_multiple(x, m):
    return (x + m - 1) // m * m


def _flash_kernel(kvlen_ref, q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref,
                  *, causal, t0, bq, bk, d, num_k, scale):
    import jax.experimental.pallas as pl

    nh = pl.program_id(0)
    qi = pl.program_id(1)
    kb = pl.program_id(2)

    @pl.when(kb == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    row0 = t0 + qi * bq  # absolute position of first query row
    col0 = kb * bk

    # Skip blocks strictly above the causal diagonal.
    run = (col0 <= row0 + bq - 1) if causal else True

    @pl.when(run if causal else True)
    def _body():
        # feed the MXU in the INPUT dtype with fp32 accumulation: a
        # pre-cast to fp32 forces multi-pass fp32 MXU matmuls (~4x
        # slower on bf16 inputs); scale applies to the fp32 scores
        qk = jax.lax.dot_general(
            q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale    # (bq, bk)

        cols = col0 + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
        masked = cols >= kvlen_ref[nh]
        if causal:
            rows = row0 + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)
            masked = masked | (cols > rows)
        qk = jnp.where(masked, NEG_INF, qk)

        m_prev = m_ref[:]                                   # (bq, 1)
        m_new = jnp.maximum(m_prev, jnp.max(qk, axis=-1, keepdims=True))
        p = jnp.exp(qk - m_new)
        corr = jnp.exp(m_prev - m_new)
        l_ref[:] = l_ref[:] * corr + jnp.sum(p, axis=-1, keepdims=True)
        acc_ref[:] = acc_ref[:] * corr + jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        m_ref[:] = m_new

    @pl.when(kb == num_k - 1)
    def _finish():
        l = jnp.maximum(l_ref[:], 1e-30)
        o_ref[0] = (acc_ref[:] / l).astype(o_ref.dtype)


def _flash_seg_kernel(kvlen_ref, q_ref, k_ref, v_ref, segq_ref, segk_ref,
                      o_ref, m_ref, l_ref, acc_ref, *, causal, t0, bq, bk,
                      d, num_k, scale):
    """Forward with per-token segment ids (packed sequences): tokens
    attend only within their own segment — the block-diagonal x causal
    pattern of hap --pack. Segment comparison is one VPU compare on the
    (bq, bk) score tile; the O(T^2) mask tensor the XLA path would
    materialize in HBM never exists."""
    import jax.experimental.pallas as pl

    nh = pl.program_id(0)
    qi = pl.program_id(1)
    kb = pl.program_id(2)

    @pl.when(kb == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    row0 = t0 + qi * bq
    col0 = kb * bk
    run = (col0 <= row0 + bq - 1) if causal else True

    @pl.when(run if causal else True)
    def _body():
        qk = jax.lax.dot_general(
            q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale    # (bq, bk)

        cols = col0 + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
        masked = cols >= kvlen_ref[nh]
        if causal:
            rows = row0 + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)
            masked = masked | (cols > rows)
        masked = masked | (segq_ref[0] != segk_ref[0])     # (bq,1)!=(1,bk)

        qk = jnp.where(masked, NEG_INF, qk)
        m_prev = m_ref[:]
        m_new = jnp.maximum(m_prev, jnp.max(qk, axis=-1, keepdims=True))
        p = jnp.exp(qk - m_new)
        corr = jnp.exp(m_prev - m_new)
        l_ref[:] = l_ref[:] * corr + jnp.sum(p, axis=-1, keepdims=True)
        acc_ref[:] = acc_ref[:] * corr + jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        m_ref[:] = m_new

    @pl.when(kb == num_k - 1)
    def _finish():
        l = jnp.maximum(l_ref[:], 1e-30)
        o_ref[0] = (acc_ref[:] / l).astype(o_ref.dtype)


def _flash_kernel_lse(kvlen_ref, q_ref, k_ref, v_ref, o_ref, lse_ref,
                      m_ref, l_ref, acc_ref, *, causal, t0, bq, bk, d,
                      num_k, scale):
    """Forward variant that also emits lse = m + log(l) per row (needed
    by the backward kernels)."""
    import jax.experimental.pallas as pl

    _flash_kernel(kvlen_ref, q_ref, k_ref, v_ref, o_ref, m_ref, l_ref,
                  acc_ref, causal=causal, t0=t0, bq=bq, bk=bk, d=d,
                  num_k=num_k, scale=scale)

    kb = pl.program_id(2)

    @pl.when(kb == num_k - 1)
    def _emit_lse():
        l = jnp.maximum(l_ref[:], 1e-30)
        lse_ref[0] = m_ref[:] + jnp.log(l)


def _flash_bwd_dq_kernel(kvlen_ref, q_ref, k_ref, v_ref, do_ref, lse_ref,
                         delta_ref, dq_ref, acc_ref, *, causal, t0, bq, bk,
                         num_k, scale):
    import jax.experimental.pallas as pl

    nh = pl.program_id(0)
    qi = pl.program_id(1)
    kb = pl.program_id(2)

    @pl.when(kb == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    row0 = t0 + qi * bq
    col0 = kb * bk
    run = (col0 <= row0 + bq - 1) if causal else True

    @pl.when(run if causal else True)
    def _body():
        # bf16-in/fp32-accumulate matmuls (see forward); ds rounds to
        # the K dtype before the dq dot — standard flash-backward
        qk = jax.lax.dot_general(q_ref[0], k_ref[0],
                                 (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32) * scale
        cols = col0 + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
        masked = cols >= kvlen_ref[nh]
        if causal:
            rows = row0 + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)
            masked = masked | (cols > rows)
        qk = jnp.where(masked, NEG_INF, qk)

        p = jnp.exp(qk - lse_ref[0])                         # (bq, bk)
        p = jnp.where(masked, 0.0, p)
        dp = jax.lax.dot_general(do_ref[0], v_ref[0],
                                 (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - delta_ref[0])
        acc_ref[:] += jax.lax.dot_general(
            ds.astype(k_ref.dtype), k_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale

    @pl.when(kb == num_k - 1)
    def _finish():
        dq_ref[0] = acc_ref[:].astype(dq_ref.dtype)


def _flash_bwd_dkv_kernel(kvlen_ref, q_ref, k_ref, v_ref, do_ref, lse_ref,
                          delta_ref, dk_ref, dv_ref, dk_acc, dv_acc, *,
                          causal, t0, bq, bk, num_q, scale):
    import jax.experimental.pallas as pl

    nh = pl.program_id(0)
    kb = pl.program_id(1)
    qi = pl.program_id(2)

    @pl.when(qi == 0)
    def _init():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    row0 = t0 + qi * bq
    col0 = kb * bk
    run = (col0 <= row0 + bq - 1) if causal else True

    @pl.when(run if causal else True)
    def _body():
        qk = jax.lax.dot_general(q_ref[0], k_ref[0],
                                 (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32) * scale
        cols = col0 + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
        masked = cols >= kvlen_ref[nh]
        if causal:
            rows = row0 + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)
            masked = masked | (cols > rows)
        qk = jnp.where(masked, NEG_INF, qk)
        p = jnp.exp(qk - lse_ref[0])
        p = jnp.where(masked, 0.0, p)

        # dv += p^T @ do
        dv_acc[:] += jax.lax.dot_general(
            p.astype(do_ref.dtype), do_ref[0], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(do_ref[0], v_ref[0],
                                 (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - delta_ref[0])
        # dk += (ds^T @ q) * scale
        dk_acc[:] += jax.lax.dot_general(
            ds.astype(q_ref.dtype), q_ref[0], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale

    @pl.when(qi == num_q - 1)
    def _finish():
        dk_ref[0] = dk_acc[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)


def _pad_pack(q, k, v, bq, bk):
    N, H, T, D = q.shape
    S = k.shape[2]
    # Auto block sizes: big blocks win decisively on TPU (measured on
    # v5e, B=32 h=12 d=64 causal: T=512 (512,512) 2.0ms vs (128,128)
    # 3.9ms; T=1024 (1024,1024) 3.4ms vs 11.7ms) because each program's
    # matmul gets MXU-sized and per-program overhead amortizes. Cap at
    # 1024 so the (bq, bk) fp32 score tile stays ~4MB of VMEM.
    if bq is None:
        bq = 1024
    if bk is None:
        bk = 1024
    bq = min(bq, _next_multiple(T, 8))
    bk = min(bk, _next_multiple(S, 128))
    Tp = _next_multiple(T, bq)
    Sp = _next_multiple(S, bk)
    # D is NOT padded to 128: a block whose last dim equals the array
    # dim is legal, and padding would double the MXU work for head_dim
    # 64. Only tiny head dims get padded up to the fp32 sublane width.
    Dp = D if D % 8 == 0 else _next_multiple(D, 8)
    qp = jnp.pad(q, ((0, 0), (0, 0), (0, Tp - T), (0, Dp - D)))
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, Sp - S), (0, Dp - D)))
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, Sp - S), (0, Dp - D)))
    return (qp.reshape(N * H, Tp, Dp), kp.reshape(N * H, Sp, Dp),
            vp.reshape(N * H, Sp, Dp), bq, bk, Tp, Sp, Dp)


def _compiler_params():
    from jax.experimental.pallas import tpu as pltpu
    try:
        return pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"))
    except TypeError:
        return pltpu.CompilerParams()


def _kv_index_fn(causal, t0, bq, bk):
    if causal:
        # clamp masked K blocks to the last needed index: Pallas elides
        # the DMA when a block index repeats, so fully-masked blocks
        # cost neither bandwidth nor compute (pl.when skips the math)
        def kv_index(nh, qi, kb):
            last_needed = (t0 + (qi + 1) * bq - 1) // bk
            return (nh, jnp.minimum(kb, last_needed), 0)
    else:
        def kv_index(nh, qi, kb):
            return (nh, kb, 0)
    return kv_index


def _flash_forward(q, k, v, kv_lengths, causal, t0, interpret=False,
                   bq=None, bk=None, with_lse=False):
    """q: (N, H, T, D); k, v: (N, H, S, D); kv_lengths: (N,) int32."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N, H, T, D = q.shape
    qp, kp, vp, bq, bk, Tp, Sp, Dp = _pad_pack(q, k, v, bq, bk)
    kvl = jnp.broadcast_to(kv_lengths[:, None], (N, H)).reshape(N * H)

    num_q, num_k = Tp // bq, Sp // bk
    scale = 1.0 / math.sqrt(D)
    kv_index = _kv_index_fn(causal, t0, bq, bk)

    kern = _flash_kernel_lse if with_lse else _flash_kernel
    kernel = functools.partial(
        kern, causal=causal, t0=t0, bq=bq, bk=bk, d=Dp,
        num_k=num_k, scale=scale)

    out_shape = jax.ShapeDtypeStruct((N * H, Tp, Dp), q.dtype)
    out_specs = pl.BlockSpec((1, bq, Dp), lambda nh, qi, kb: (nh, qi, 0))
    if with_lse:
        out_shape = (out_shape,
                     jax.ShapeDtypeStruct((N * H, Tp, 1), jnp.float32))
        out_specs = (out_specs,
                     pl.BlockSpec((1, bq, 1),
                                  lambda nh, qi, kb: (nh, qi, 0)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(N * H, num_q, num_k),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # full kv-lengths
            pl.BlockSpec((1, bq, Dp), lambda nh, qi, kb: (nh, qi, 0)),
            pl.BlockSpec((1, bk, Dp), kv_index),
            pl.BlockSpec((1, bk, Dp), kv_index),
        ],
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, Dp), jnp.float32),
        ],
    )

    res = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(kvl, qp, kp, vp)
    if with_lse:
        out, lse = res
        return out.reshape(N, H, Tp, Dp)[:, :, :T, :D], lse
    return res.reshape(N, H, Tp, Dp)[:, :, :T, :D]


def _packed_reference(q, k, v, segment_ids, causal):
    """Materialized oracle for the packed kernel (backward recompute)."""
    from haloop_tpu.ops.attention import attend, causal_mask
    mask = (segment_ids[:, None, :, None] !=
            segment_ids[:, None, None, :])
    if causal:
        mask = mask | causal_mask(q.shape[-2], k.shape[-2])
    return attend(q, k, v, mask=mask)[0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def flash_attention_packed(q, k, v, segment_ids, causal=True,
                           interpret=False, bq=None, bk=None):
    """Fused attention over packed rows: q/k/v (N, H, T, D) self-attention
    with per-token ``segment_ids`` (N, T) — block-diagonal (x causal)
    masking inside the kernel. Forward is the Pallas kernel (hap --pack
    scoring hot path); the backward recomputes through the materialized
    reference (correct everywhere; packed TRAINING is not a hot path)."""
    return _packed_impl(q, k, v, segment_ids, causal, interpret, bq, bk)


def _packed_fwd(q, k, v, segment_ids, causal, interpret, bq, bk):
    out = _packed_impl(q, k, v, segment_ids, causal, interpret, bq, bk)
    return out, (q, k, v, segment_ids)


def _packed_bwd(causal, interpret, bq, bk, res, g):
    q, k, v, segment_ids = res
    _, vjp = jax.vjp(
        lambda q_, k_, v_: _packed_reference(q_, k_, v_, segment_ids,
                                             causal), q, k, v)
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None


flash_attention_packed.defvjp(_packed_fwd, _packed_bwd)


def _packed_impl(q, k, v, segment_ids, causal=True,
                 interpret=False, bq=None, bk=None):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N, H, T, D = q.shape
    qp, kp, vp, bq, bk, Tp, Sp, Dp = _pad_pack(q, k, v, bq, bk)
    kvl = jnp.full((N * H,), T, jnp.int32)

    seg = jnp.pad(segment_ids.astype(jnp.int32), ((0, 0), (0, Tp - T)),
                  constant_values=-1)
    seg = jnp.broadcast_to(seg[:, None, :], (N, H, Tp)).reshape(N * H, Tp)
    segq = seg[:, :, None]                                # (NH, Tp, 1)
    segk = seg[:, None, :]                                # (NH, 1, Sp)

    num_q, num_k = Tp // bq, Sp // bk
    scale = 1.0 / math.sqrt(D)
    kv_index = _kv_index_fn(causal, 0, bq, bk)

    kernel = functools.partial(
        _flash_seg_kernel, causal=causal, t0=0, bq=bq, bk=bk, d=Dp,
        num_k=num_k, scale=scale)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(N * H, num_q, num_k),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, bq, Dp), lambda nh, qi, kb: (nh, qi, 0)),
            pl.BlockSpec((1, bk, Dp), kv_index),
            pl.BlockSpec((1, bk, Dp), kv_index),
            pl.BlockSpec((1, bq, 1), lambda nh, qi, kb: (nh, qi, 0)),
            pl.BlockSpec((1, 1, bk),
                         lambda nh, qi, kb: (nh, 0, kb) if not causal
                         else (nh, 0, kv_index(nh, qi, kb)[1])),
        ],
        out_specs=pl.BlockSpec((1, bq, Dp), lambda nh, qi, kb: (nh, qi, 0)),
        scratch_shapes=[
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, Dp), jnp.float32),
        ],
    )

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((N * H, Tp, Dp), q.dtype),
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(kvl, qp, kp, vp, segq, segk)
    return out.reshape(N, H, Tp, Dp)[:, :, :T, :D]


def _flash_backward(q, k, v, kv_lengths, causal, t0, o, lse, do,
                    interpret=False, bq=None, bk=None):
    """Kernelized dq/dk/dv. lse: (NH, Tp) from the forward."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N, H, T, D = q.shape
    S = k.shape[2]
    qp, kp, vp, bq, bk, Tp, Sp, Dp = _pad_pack(q, k, v, bq, bk)
    dop = jnp.pad(do, ((0, 0), (0, 0), (0, Tp - T), (0, Dp - D))) \
        .reshape(N * H, Tp, Dp)
    kvl = jnp.broadcast_to(kv_lengths[:, None], (N, H)).reshape(N * H)

    # delta = rowsum(do * o): tiny elementwise reduce, XLA-fused
    delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32), -1)
    delta = jnp.pad(delta, ((0, 0), (0, 0), (0, Tp - T))) \
        .reshape(N * H, Tp, 1)

    num_q, num_k = Tp // bq, Sp // bk
    scale = 1.0 / math.sqrt(D)
    kv_index = _kv_index_fn(causal, t0, bq, bk)

    dq_kernel = functools.partial(
        _flash_bwd_dq_kernel, causal=causal, t0=t0, bq=bq, bk=bk,
        num_k=num_k, scale=scale)
    dq = pl.pallas_call(
        dq_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(N * H, num_q, num_k),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((1, bq, Dp), lambda nh, qi, kb: (nh, qi, 0)),
                pl.BlockSpec((1, bk, Dp), kv_index),
                pl.BlockSpec((1, bk, Dp), kv_index),
                pl.BlockSpec((1, bq, Dp), lambda nh, qi, kb: (nh, qi, 0)),
                pl.BlockSpec((1, bq, 1), lambda nh, qi, kb: (nh, qi, 0)),
                pl.BlockSpec((1, bq, 1), lambda nh, qi, kb: (nh, qi, 0)),
            ],
            out_specs=pl.BlockSpec((1, bq, Dp),
                                   lambda nh, qi, kb: (nh, qi, 0)),
            scratch_shapes=[pltpu.VMEM((bq, Dp), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((N * H, Tp, Dp), q.dtype),
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(kvl, qp, kp, vp, dop, lse, delta)

    # dk/dv: grid sequential over q blocks; for causal, skip q blocks
    # before the diagonal by clamping (DMA-elision like the forward)
    if causal:
        def q_index(nh, kb, qi):
            first_needed = jnp.maximum((kb * bk - t0) // bq, 0)
            return (nh, jnp.maximum(qi, first_needed), 0)

        def q_index2(nh, kb, qi):
            first_needed = jnp.maximum((kb * bk - t0) // bq, 0)
            return (nh, jnp.maximum(qi, first_needed), 0)
    else:
        def q_index(nh, kb, qi):
            return (nh, qi, 0)

        def q_index2(nh, kb, qi):
            return (nh, qi, 0)

    dkv_kernel = functools.partial(
        _flash_bwd_dkv_kernel, causal=causal, t0=t0, bq=bq, bk=bk,
        num_q=num_q, scale=scale)
    dk, dv = pl.pallas_call(
        dkv_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(N * H, num_k, num_q),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((1, bq, Dp), q_index),
                pl.BlockSpec((1, bk, Dp), lambda nh, kb, qi: (nh, kb, 0)),
                pl.BlockSpec((1, bk, Dp), lambda nh, kb, qi: (nh, kb, 0)),
                pl.BlockSpec((1, bq, Dp), q_index),
                pl.BlockSpec((1, bq, 1), q_index2),
                pl.BlockSpec((1, bq, 1), q_index2),
            ],
            out_specs=(
                pl.BlockSpec((1, bk, Dp), lambda nh, kb, qi: (nh, kb, 0)),
                pl.BlockSpec((1, bk, Dp), lambda nh, kb, qi: (nh, kb, 0)),
            ),
            scratch_shapes=[pltpu.VMEM((bk, Dp), jnp.float32),
                            pltpu.VMEM((bk, Dp), jnp.float32)],
        ),
        out_shape=(jax.ShapeDtypeStruct((N * H, Sp, Dp), k.dtype),
                   jax.ShapeDtypeStruct((N * H, Sp, Dp), v.dtype)),
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(kvl, qp, kp, vp, dop, lse, delta)

    dq = dq.reshape(N, H, Tp, Dp)[:, :, :T, :D]
    dk = dk.reshape(N, H, Sp, Dp)[:, :, :S, :D]
    dv = dv.reshape(N, H, Sp, Dp)[:, :, :S, :D]
    return dq, dk, dv


def _reference(q, k, v, kv_lengths, causal, t0):
    d = k.shape[-1]
    qk = jnp.einsum("nhtd,nhsd->nhts", q, k,
                    preferred_element_type=jnp.float32) / math.sqrt(d)
    S, T = k.shape[-2], q.shape[-2]
    mask = jnp.arange(S)[None, :] >= kv_lengths[:, None]      # (N, S)
    mask = mask[:, None, None, :]
    if causal:
        rows = t0 + jnp.arange(T)[:, None]
        mask = mask | (jnp.arange(S)[None, :] > rows)
    qk = jnp.where(mask, NEG_INF, qk)
    att = jax.nn.softmax(qk, axis=-1)
    return jnp.einsum("nhts,nhsd->nhtd", att.astype(v.dtype), v,
                      preferred_element_type=jnp.float32).astype(v.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def flash_attention(q, k, v, kv_lengths, causal=False, t0=0, interpret=False):
    """Fused attention. q (N,H,T,D), kv (N,H,S,D), kv_lengths (N,)."""
    return _flash_forward(q, k, v, kv_lengths, causal, t0, interpret=interpret)


def _fwd(q, k, v, kv_lengths, causal, t0, interpret):
    out, lse = _flash_forward(q, k, v, kv_lengths, causal, t0,
                              interpret=interpret, with_lse=True)
    return out, (q, k, v, kv_lengths, out, lse)


_BWD_KERNEL_MIN_S = 0      # kernel backward wins at every size with the
                           # auto block sizes (v5e: 8.8 vs 11.3 ms at
                           # S=256, 7.1 vs 8.0 at 512, 8.8 vs 12.8 at
                           # 1024, 9.8 vs 19.3 at 2048); keep the knob
                           # for A/B measurements


def _bwd(causal, t0, interpret, res, g):
    q, k, v, kv_lengths, o, lse = res
    if k.shape[-2] >= _BWD_KERNEL_MIN_S or interpret:
        dq, dk, dv = _flash_backward(q, k, v, kv_lengths, causal, t0, o,
                                     lse, g, interpret=interpret)
    else:
        _, vjp = jax.vjp(
            lambda q, k, v: _reference(q, k, v, kv_lengths, causal, t0),
            q, k, v)
        dq, dk, dv = vjp(g)
    return dq, dk, dv, None


flash_attention.defvjp(_fwd, _bwd)


