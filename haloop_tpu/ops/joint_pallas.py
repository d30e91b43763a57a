"""Fused RNN-T joint logsumexp as a Pallas TPU kernel.

The transducer loss needs only three (N, T, U+1)-shaped quantities from
the additive joint f[t] + g[u]: its logsumexp over the vocabulary, the
blank logit, and the per-(t,u) target-label logit. The blank/label
logits are cheap gathers on f and g — but the reference formulation
(ha/recognizer.py:109-126 via torchaudio's rnnt_loss, and our
models/recognizer.transducer_loss) materializes the full
(N, T, U+1, V) joint twice (logits + log_softmax): at N=8, T=300, U=24,
V=512 that is ~250 MB of HBM traffic per step for 60 KB of useful
output. This kernel streams f and g tiles through VMEM and reduces the
vocabulary axis on the fly: HBM cost drops to reading f and g once and
writing (N, T, U+1).

pairwise_lse(f (N,T,V), g (N,U1,V)) -> (N,T,U1) float32, custom VJP
with analytic softmax backward (also fused, never materializing the
joint).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from haloop_tpu.ops.ctc_pallas import _interp, _round_up

NEG = -1e30


def _lse_kernel(f_ref, g_ref, out_ref, *, U1, UP):
    f = f_ref[0].astype(jnp.float32)                      # (TT, V)
    TT = f.shape[0]
    cols = jax.lax.broadcasted_iota(jnp.int32, (TT, UP), 1)
    acc = jnp.full((TT, UP), NEG)
    for u in range(U1):
        fg = f + g_ref[0, u, :][None, :].astype(jnp.float32)
        m = jnp.max(fg, -1, keepdims=True)                # (TT, 1)
        lse = m + jnp.log(jnp.sum(jnp.exp(fg - m), -1, keepdims=True))
        acc = jnp.where(cols == u, lse, acc)
    out_ref[0] = acc


def _dfg_kernel(f_ref, g_ref, lse_ref, dl_ref, df_ref, dg_ref, dg_acc,
                *, U1):
    """Fused df AND dg: the joint softmax p is the expensive part
    (exp over (TT, V) per u) and both grads consume the same p, so one
    pass computes p once and feeds both accumulators."""
    ti = pl.program_id(1)
    nt = pl.num_programs(1)

    @pl.when(ti == 0)
    def _():
        dg_acc[:] = jnp.zeros_like(dg_acc)

    f = f_ref[0].astype(jnp.float32)
    facc = jnp.zeros_like(f)
    for u in range(U1):
        pdl = jnp.exp(f + g_ref[0, u, :][None, :].astype(jnp.float32)
                      - lse_ref[0, :, u][:, None]) * \
            dl_ref[0, :, u][:, None]                          # (TT, V)
        facc = facc + pdl
        dg_acc[u, :] += jnp.sum(pdl, 0)                       # (V,)
    df_ref[0] = facc.astype(df_ref.dtype)

    @pl.when(ti == nt - 1)
    def _():
        dg_ref[0] = dg_acc[:].astype(dg_ref.dtype)


def _pad(f, g, TT):
    N, T, V = f.shape
    U1 = g.shape[1]
    TP = _round_up(T, TT)
    VP = _round_up(V, 128)
    UG = _round_up(U1, 8)
    # padded vocab entries must not contribute to the logsumexp
    f = jnp.pad(f, ((0, 0), (0, TP - T), (0, VP - V)),
                constant_values=NEG / 2)
    g = jnp.pad(g, ((0, 0), (0, UG - U1), (0, VP - V)),
                constant_values=NEG / 2)
    return f, g, TP, VP, UG


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def pairwise_lse(f, g, interpret=False):
    """lse[n, t, u] = logsumexp_v(f[n, t, v] + g[n, u, v]), fused."""
    return _lse_fwd_impl(f, g, interpret)


def _lse_fwd_impl(f, g, interpret=False):
    N, T, V = f.shape
    U1 = g.shape[1]
    TT = min(128, _round_up(T, 8))
    fp, gp, TP, VP, UG = _pad(f, g, TT)
    UP = _round_up(U1, 128)
    kernel = functools.partial(_lse_kernel, U1=U1, UP=UP)
    out = pl.pallas_call(
        kernel,
        grid=(N, TP // TT),
        in_specs=[
            pl.BlockSpec((1, TT, VP), lambda n, t: (n, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, UG, VP), lambda n, t: (n, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TT, UP), lambda n, t: (n, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, TP, UP), jnp.float32),
        interpret=_interp(interpret),
    )(fp, gp)
    return out[:, :T, :U1]


def _lse_fwd(f, g, interpret):
    lse = _lse_fwd_impl(f, g, interpret)
    return lse, (f, g, lse)


def _lse_bwd_impl(f, g, lse, dlse, interpret=False):
    N, T, V = f.shape
    U1 = g.shape[1]
    TT = min(128, _round_up(T, 8))
    fp, gp, TP, VP, UG = _pad(f, g, TT)
    UP = _round_up(U1, 8)
    lsep = jnp.pad(lse, ((0, 0), (0, TP - T), (0, UP - U1)))
    # zero upstream grads on padded rows so they contribute nothing
    dlp = jnp.pad(dlse, ((0, 0), (0, TP - T), (0, UP - U1)))

    df, dg = pl.pallas_call(
        functools.partial(_dfg_kernel, U1=U1),
        grid=(N, TP // TT),
        in_specs=[
            pl.BlockSpec((1, TT, VP), lambda n, t: (n, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, UG, VP), lambda n, t: (n, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TT, UP), lambda n, t: (n, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TT, UP), lambda n, t: (n, t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, TT, VP), lambda n, t: (n, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, UG, VP), lambda n, t: (n, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N, TP, VP), f.dtype),
            jax.ShapeDtypeStruct((N, UG, VP), g.dtype),
        ],
        scratch_shapes=[pltpu.VMEM((UG, VP), jnp.float32)],
        interpret=_interp(interpret),
    )(fp, gp, lsep, dlp)

    return df[:, :T, :V], dg[:, :U1, :V]


def _lse_bwd(interpret, res, dlse):
    f, g, lse = res
    return _lse_bwd_impl(f, g, lse, dlse, interpret)


pairwise_lse.defvjp(_lse_fwd, _lse_bwd)


def pairwise_lse_reference(f, g):
    """Oracle: materialized joint."""
    joint = f[:, :, None, :].astype(jnp.float32) + \
        g[:, None, :, :].astype(jnp.float32)
    return jax.scipy.special.logsumexp(joint, axis=-1)
