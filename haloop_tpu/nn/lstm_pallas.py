"""LSTM recurrence as Pallas kernels with the recurrent matrix resident
in VMEM across the whole sequence.

Why: the lax.scan LSTM re-streams W_hh (4H, H) from HBM on every one of
T sequential steps — for the hac ``lstm:512`` bench config (H=1536,
T'~300, 3 layers) that is the training-throughput floor
(PERFORMANCE.md). These kernels run the entire time loop as a
sequential Pallas grid: h/c live in VMEM scratch, W_hh is a
constant-index block the hardware fetches ONCE (consecutive grid steps
with an unchanged block index elide the DMA), and each step is one MXU
matmul plus the VPU gate math in fp32. HBM traffic drops to streaming
x_proj in and h out. v5e VMEM comfortably holds the 18.9 MB bf16
matrix once the default 16 MB scoped-vmem limit is raised
(vmem_limit_bytes below); measured 2.7x over the scan forward.

Two weight modes:
  * exact (default on TPU): W_hh cast to bf16 resident, fp32 gate math
    — at least as precise as the bf16 XLA scan it replaces.
  * int8 (opt-in, HALOOP_RNN_Q8=1 / hac --rnn-q8): symmetric per-row
    int8 weights at half the VMEM footprint, for hidden sizes whose
    bf16 matrix doesn't fit. |h| < 1 for an LSTM, so hidden states
    quantize with constant scale 127 and the per-element error
    (~1/254) averages out over the H-wide dot to ~bf16-level noise.
    The backward folds the per-row scales into dgates before the
    (dgates @ W) chain and re-quantizes per batch row; gradients are
    straight-through onto the master weights.

Replaces the spec of cuDNN LSTM at ha/rnn.py:11,39 (SURVEY §2.4);
parity oracle is nn/lstm.lstm_scan (tests/test_lstm_pallas.py).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


from haloop_tpu.ops.ctc_pallas import _interp, _round_up


def quantize_rows(w):
    """Symmetric per-row int8: w (R, K) -> (wq int8, s (R,) f32),
    w ~= wq * s[:, None]."""
    s = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=1) / 127.0
    s = jnp.maximum(s, 1e-20)
    wq = jnp.clip(jnp.round(w.astype(jnp.float32) / s[:, None]),
                  -127, 127).astype(jnp.int8)
    return wq, s


def _q8_row(x, scale=127.0):
    return jnp.clip(jnp.round(x * scale), -127, 127).astype(jnp.int8)


_VMEM = dict(memory_space=pltpu.VMEM)
_PARAMS = pltpu.CompilerParams(dimension_semantics=("arbitrary",),
                               vmem_limit_bytes=100 * 1024 * 1024)


# ------------------------------------------------------------- forward

def _fwd_kernel(quant, H, out_dtype, residuals, *refs):
    if residuals:
        (xp_ref, w_ref, sdiv_ref, h0_ref, c0_ref,
         ys_ref, acts_ref, cs_ref, hl_ref, cl_ref, h_s, c_s) = refs
    else:
        (xp_ref, w_ref, sdiv_ref, h0_ref, c0_ref,
         ys_ref, hl_ref, cl_ref, h_s, c_s) = refs
    t = pl.program_id(0)
    T = pl.num_programs(0)

    @pl.when(t == 0)
    def _():
        h_s[:] = h0_ref[:]
        c_s[:] = c0_ref[:]

    h = h_s[:]
    c = c_s[:]
    if quant:
        hq = _q8_row(h)                                     # (Bp, Hp) int8
        acc = jax.lax.dot_general(
            hq, w_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32)               # (Bp, 4Hp)
        rec = acc.astype(jnp.float32) * sdiv_ref[:]         # sdiv = s/127
    else:
        # recurrent matmul in the layer's compute dtype (bf16 paths keep
        # bf16 MXU speed, fp32 paths full precision), fp32 accumulation
        rec = jax.lax.dot_general(
            h.astype(w_ref.dtype), w_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)             # (Bp, 4Hp)
    gates = xp_ref[0].astype(jnp.float32) + rec
    i = jax.nn.sigmoid(gates[:, 0 * H:1 * H])
    f = jax.nn.sigmoid(gates[:, 1 * H:2 * H])
    g = jnp.tanh(gates[:, 2 * H:3 * H])
    o = jax.nn.sigmoid(gates[:, 3 * H:4 * H])
    c = f * c + i * g
    h = o * jnp.tanh(c)
    h_s[:] = h
    c_s[:] = c
    ys_ref[0] = h.astype(out_dtype)
    if residuals:
        # cuDNN-style residuals: the backward reruns NO forward math
        acts_ref[0] = jnp.concatenate([i, f, g, o], -1
                                      ).astype(acts_ref.dtype)
        cs_ref[0] = c.astype(cs_ref.dtype)

    @pl.when(t == T - 1)
    def _():
        hl_ref[:] = h
        cl_ref[:] = c


def _pad_gatewise(a, H, Hp, axis):
    """Pad the (..., 4H) gate axis to (..., 4Hp) keeping gate alignment."""
    shape = a.shape[:axis] + (4, H) + a.shape[axis + 1:]
    widths = [(0, 0)] * len(shape)
    widths[axis + 1] = (0, Hp - H)
    g = jnp.pad(a.reshape(shape), widths)
    return g.reshape(a.shape[:axis] + (4 * Hp,) + a.shape[axis + 1:])


def _fwd(w, s, x_proj, h0, c0, quant, interpret=False, residuals=True):
    """x_proj (T, B, 4H); w: (4H, H) int8 (quant) or x_proj's dtype;
    s (4H,) or None. With ``residuals`` also streams gate activations
    and cell states out for the backward; the primal (no-grad) path
    skips them (saves (T, B, 5H) of HBM writes per layer)."""
    T, B, H4 = x_proj.shape
    H = H4 // 4
    Hp = _round_up(H, 128)
    Bp = _round_up(max(B, 32), 32) if quant else _round_up(max(B, 8), 8)
    if Hp != H:
        x_proj = _pad_gatewise(x_proj, H, Hp, 2)
        wg = w.reshape(4, H, H)
        w = jnp.pad(wg, ((0, 0), (0, Hp - H), (0, Hp - H))
                    ).reshape(4 * Hp, Hp)
        if s is not None:
            s = jnp.pad(s.reshape(4, H), ((0, 0), (0, Hp - H))).reshape(-1)
        h0 = jnp.pad(h0, ((0, 0), (0, Hp - H)))
        c0 = jnp.pad(c0, ((0, 0), (0, Hp - H)))
    if Bp != B:
        x_proj = jnp.pad(x_proj, ((0, 0), (0, Bp - B), (0, 0)))
        h0 = jnp.pad(h0, ((0, Bp - B), (0, 0)))
        c0 = jnp.pad(c0, ((0, Bp - B), (0, 0)))

    if s is None:
        sdiv = jnp.zeros((1, 4 * Hp), jnp.float32)          # unused
    else:
        sdiv = (s / 127.0).astype(jnp.float32)[None, :]
    out_dtype = x_proj.dtype
    # residual dtype follows the compute dtype (q8 opted into noise)
    res_dtype = jnp.bfloat16 if (quant or out_dtype == jnp.bfloat16) \
        else jnp.float32

    kernel = functools.partial(_fwd_kernel, quant, Hp, out_dtype,
                               residuals)
    out_specs = [pl.BlockSpec((1, Bp, Hp), lambda t: (t, 0, 0), **_VMEM)]
    out_shape = [jax.ShapeDtypeStruct((T, Bp, Hp), out_dtype)]
    if residuals:
        out_specs += [
            pl.BlockSpec((1, Bp, 4 * Hp), lambda t: (t, 0, 0), **_VMEM),
            pl.BlockSpec((1, Bp, Hp), lambda t: (t, 0, 0), **_VMEM),
        ]
        out_shape += [
            jax.ShapeDtypeStruct((T, Bp, 4 * Hp), res_dtype),
            jax.ShapeDtypeStruct((T, Bp, Hp), res_dtype),
        ]
    out_specs += [
        pl.BlockSpec((Bp, Hp), lambda t: (0, 0), **_VMEM),
        pl.BlockSpec((Bp, Hp), lambda t: (0, 0), **_VMEM),
    ]
    out_shape += [
        jax.ShapeDtypeStruct((Bp, Hp), jnp.float32),
        jax.ShapeDtypeStruct((Bp, Hp), jnp.float32),
    ]
    outs = pl.pallas_call(
        kernel,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, Bp, 4 * Hp), lambda t: (t, 0, 0), **_VMEM),
            pl.BlockSpec((4 * Hp, Hp), lambda t: (0, 0), **_VMEM),
            pl.BlockSpec((1, 4 * Hp), lambda t: (0, 0), **_VMEM),
            pl.BlockSpec((Bp, Hp), lambda t: (0, 0), **_VMEM),
            pl.BlockSpec((Bp, Hp), lambda t: (0, 0), **_VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((Bp, Hp), jnp.float32),
            pltpu.VMEM((Bp, Hp), jnp.float32),
        ],
        compiler_params=_PARAMS,
        interpret=_interp(interpret),
    )(x_proj, w, sdiv, h0.astype(jnp.float32), c0.astype(jnp.float32))
    if residuals:
        ys, acts, cs, hl, cl = outs
        acts = acts[:, :B]
        if Hp != H:
            acts = acts.reshape(T, B, 4, Hp)[..., :H].reshape(T, B, 4 * H)
        return (ys[:, :B, :H], acts, cs[:, :B, :H],
                hl[:B, :H], cl[:B, :H])
    ys, hl, cl = outs
    return ys[:, :B, :H], None, None, hl[:B, :H], cl[:B, :H]


# ------------------------------------------------------------ backward

def _bwd_kernel(quant, H, dys_ref, gat_ref, cp_ref, cs_ref, w_ref,
                sfull_ref, dhl_ref, dcl_ref, dg_ref, dh0_ref, dc0_ref,
                dh_s, dc_s):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        dh_s[:] = dhl_ref[:].astype(jnp.float32)    # arrive bf16 (VMEM)
        dc_s[:] = dcl_ref[:].astype(jnp.float32)

    i = gat_ref[0, :, 0 * H:1 * H].astype(jnp.float32)
    f = gat_ref[0, :, 1 * H:2 * H].astype(jnp.float32)
    g = gat_ref[0, :, 2 * H:3 * H].astype(jnp.float32)
    o = gat_ref[0, :, 3 * H:4 * H].astype(jnp.float32)
    cp = cp_ref[0].astype(jnp.float32)
    tc = jnp.tanh(cs_ref[0].astype(jnp.float32))

    dh = dh_s[:] + dys_ref[0].astype(jnp.float32)
    do = dh * tc * o * (1 - o)
    dc = dc_s[:] + dh * o * (1 - tc * tc)
    di = dc * g * i * (1 - i)
    df = dc * cp * f * (1 - f)
    dg = dc * i * (1 - g * g)
    dgates = jnp.concatenate([di, df, dg, do], axis=-1)     # (Bp, 4Hp)
    dg_ref[0] = dgates.astype(dg_ref.dtype)                 # bf16 out

    # dh_prev = dgates @ W~ (contraction over the 4H axis)
    if quant:
        # W~ = wq * s[:, None]: fold s into dgates, re-quantize per row
        dgs = dgates * sfull_ref[:]
        m = jnp.maximum(jnp.max(jnp.abs(dgs), -1, keepdims=True), 1e-20)
        q = _q8_row(dgs / m)
        acc = jax.lax.dot_general(
            q, w_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)               # (Bp, Hp)
        dh_s[:] = acc.astype(jnp.float32) * (m / 127.0)
    else:
        dh_s[:] = jax.lax.dot_general(
            dgates.astype(w_ref.dtype), w_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    dc_s[:] = dc * f
    dh0_ref[:] = dh_s[:]
    dc0_ref[:] = dc_s[:]


def _bwd(w, s, gates, c_prev, cs, dys, dh_last, dc_last, quant,
         interpret=False):
    """gates: (T, B, 4H) post-activation (i,f,g,o) saved by the
    forward; cs (T, B, H) cell states (both in the forward's residual
    dtype). Returns (dgates (T, B, 4H) in that dtype, dh0, dc0)."""
    T, B, H4 = gates.shape
    H = H4 // 4
    Hp = _round_up(H, 128)
    Bp = _round_up(max(B, 32), 32) if quant else _round_up(max(B, 8), 8)
    if Hp != H:
        gates = _pad_gatewise(gates, H, Hp, 2)
        wg = w.reshape(4, H, H)
        w = jnp.pad(wg, ((0, 0), (0, Hp - H), (0, Hp - H))
                    ).reshape(4 * Hp, Hp)
        if s is not None:
            s = jnp.pad(s.reshape(4, H), ((0, 0), (0, Hp - H))).reshape(-1)
        c_prev = jnp.pad(c_prev, ((0, 0), (0, 0), (0, Hp - H)))
        cs = jnp.pad(cs, ((0, 0), (0, 0), (0, Hp - H)))
        dys = jnp.pad(dys, ((0, 0), (0, 0), (0, Hp - H)))
        dh_last = jnp.pad(dh_last, ((0, 0), (0, Hp - H)))
        dc_last = jnp.pad(dc_last, ((0, 0), (0, Hp - H)))
    if Bp != B:
        pad3 = ((0, 0), (0, Bp - B), (0, 0))
        gates = jnp.pad(gates, pad3)
        c_prev = jnp.pad(c_prev, pad3)
        cs = jnp.pad(cs, pad3)
        dys = jnp.pad(dys, pad3)
        dh_last = jnp.pad(dh_last, ((0, Bp - B), (0, 0)))
        dc_last = jnp.pad(dc_last, ((0, Bp - B), (0, 0)))

    if s is None:
        sfull = jnp.zeros((1, 4 * Hp), jnp.float32)         # unused
    else:
        sfull = s.astype(jnp.float32)[None, :]
    rev = lambda t: (T - 1 - t, 0, 0)
    const = lambda t: (0, 0)

    kernel = functools.partial(_bwd_kernel, quant, Hp)
    dgates, dh0, dc0 = pl.pallas_call(
        kernel,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, Bp, Hp), rev, **_VMEM),
            pl.BlockSpec((1, Bp, 4 * Hp), rev, **_VMEM),
            pl.BlockSpec((1, Bp, Hp), rev, **_VMEM),
            pl.BlockSpec((1, Bp, Hp), rev, **_VMEM),
            pl.BlockSpec((4 * Hp, Hp), const, **_VMEM),
            pl.BlockSpec((1, 4 * Hp), const, **_VMEM),
            pl.BlockSpec((Bp, Hp), const, **_VMEM),
            pl.BlockSpec((Bp, Hp), const, **_VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, Bp, 4 * Hp), rev, **_VMEM),
            pl.BlockSpec((Bp, Hp), const, **_VMEM),
            pl.BlockSpec((Bp, Hp), const, **_VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, Bp, 4 * Hp), gates.dtype),
            jax.ShapeDtypeStruct((Bp, Hp), jnp.float32),
            jax.ShapeDtypeStruct((Bp, Hp), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((Bp, Hp), jnp.float32),
            pltpu.VMEM((Bp, Hp), jnp.float32),
        ],
        compiler_params=_PARAMS,
        interpret=_interp(interpret),
    )(dys, gates, c_prev, cs, w, sfull,
      dh_last.astype(gates.dtype), dc_last.astype(gates.dtype))
    if Hp != H:
        dgates = dgates.reshape(T, Bp, 4, Hp)[:, :B, :, :H]
        dgates = dgates.reshape(T, B, 4 * H)
    else:
        dgates = dgates[:, :B]
    return dgates, dh0[:B, :H], dc0[:B, :H]


# ---------------------------------------------------------- custom VJP

@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def lstm_scan_pallas(w_hh, x_proj, h0, c0, quant=False):
    """Drop-in for nn/lstm.lstm_scan with the recurrent matrix resident
    in VMEM. w_hh (4H, H) master weights (any float dtype); x_proj
    (T, B, 4H); h0/c0 (B, H). Returns (ys, h_last, c_last)."""
    if quant:
        w, s = quantize_rows(w_hh)
    else:
        w, s = w_hh.astype(x_proj.dtype), None
    ys, _, _, h, c = _fwd(w, s, x_proj, h0.astype(jnp.float32),
                          c0.astype(jnp.float32), quant, residuals=False)
    return ys, h.astype(x_proj.dtype), c.astype(x_proj.dtype)


def _vjp_fwd(w_hh, x_proj, h0, c0, quant):
    if quant:
        w, s = quantize_rows(w_hh)
    else:
        w, s = w_hh.astype(x_proj.dtype), None
    ys, acts, cs, h, c = _fwd(w, s, x_proj, h0.astype(jnp.float32),
                              c0.astype(jnp.float32), quant)
    # the forward streams out its own gate activations and cell states
    # (cuDNN residual layout) — the backward reruns no forward math and
    # x_proj need not be retained
    return (ys, h.astype(x_proj.dtype), c.astype(x_proj.dtype)), \
        (w, s, jnp.zeros((0,), w_hh.dtype), acts, cs, h0, c0, ys)


def _vjp_bwd(quant, res, grads):
    w, s, w_sentinel, acts, cs, h0, c0, ys = res
    dys, dh_last, dc_last = grads
    T, B, H = ys.shape

    c_prev = jnp.concatenate(
        [c0[None].astype(cs.dtype), cs[:-1]], 0)
    dgates, dh0, dc0 = _bwd(
        w, s, acts, c_prev, cs, dys.astype(acts.dtype),
        dh_last.astype(jnp.float32), dc_last.astype(jnp.float32), quant)

    # dW in the residual dtype with fp32 accumulation (inputs carry no
    # more precision than that; an fp32 matmul here is 3-4x slower)
    h_prev = jnp.concatenate([h0[None].astype(ys.dtype), ys[:-1]], 0)
    dg2 = dgates.reshape(T * B, 4 * H)
    hp2 = h_prev.reshape(T * B, H).astype(dg2.dtype)
    dw_hh = jnp.dot(dg2.T, hp2, preferred_element_type=jnp.float32)
    return (dw_hh.astype(w_sentinel.dtype), dgates.astype(ys.dtype),
            dh0.astype(h0.dtype), dc0.astype(c0.dtype))


lstm_scan_pallas.defvjp(_vjp_fwd, _vjp_bwd)


def lstm_scan_q8(w_hh, x_proj, h0, c0):
    """int8-resident variant (HALOOP_RNN_Q8 opt-in)."""
    return lstm_scan_pallas(w_hh, x_proj, h0, c0, True)
