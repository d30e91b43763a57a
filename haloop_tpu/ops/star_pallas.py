"""Fused Star-CTC lattice as Pallas TPU kernels.

Same architecture as ops/ctc_pallas.py (alpha resident in VMEM over the
whole time axis, analytic backward sweep), applied to the star trellis
of ops/star.py: 4S+3 interspersed states
(blank, <star>\\t, blank, t, ..., blank, <star>, blank) over the doubled
vocabulary, the 6-point transition stencil including the star<-blank
back edge, star_penalty charged on entry into star states, and the
terminal score as the logadd of the final four states.

Lane layout inside the kernel mirrors the scan's padded alpha exactly:
4 leading virtual-start lanes (0.0 at t=0 so the first step's stencil
reads them, reference ha/star.py:94-112), S_ real state lanes, then the
reference's -7007.7007 sentinel lane feeding the back edge of the last
state. The custom VJP sits on the star-vocabulary emissions; autodiff
chains through ``intersperse_stars``'s logsumexp/logsubexp to the raw
log-probs.

Parity oracle: ops/star.star_ctc_forward_score (itself tested against
the reference at three penalties, tests/test_star.py).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from haloop_tpu.ops.ctc import intersperse_blanks
from haloop_tpu.ops.ctc_pallas import (NEG, _interp, _round_up,
                                       _shift_left, _shift_right, _tiles)
from haloop_tpu.ops.star import intersperse_stars

SENTINEL = -7007.7007
PAD = 4


def _lse(*terms):
    m = terms[0]
    for t in terms[1:]:
        m = jnp.maximum(m, t)
    m = jnp.maximum(m, NEG)            # keep exp() finite on all-NEG lanes
    acc = jnp.zeros_like(m)
    for t in terms:
        acc = acc + jnp.exp(t - m)
    return m + jnp.log(acc)


def _lane_types(shape, S_):
    """Per-lane state types in the padded layout (lane = PAD + s)."""
    cols = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    s = cols - PAD
    real = (s >= 0) & (s < S_)
    is_blank = real & (s % 2 == 0)
    is_star = real & (s % 4 == 1)
    is_label = real & (s % 4 == 3)
    return cols, real, is_blank, is_star, is_label


def _star_fwd_kernel(em_ref, same_ref, len_ref, ulen_ref, hist_ref,
                     loss_ref, alpha_ref, final_ref, *, TT, SPP, S_,
                     penalty):
    j = pl.program_id(1)
    nt = pl.num_programs(1)
    shape = (em_ref.shape[0], SPP)
    cols, real, is_blank, is_star, is_label = _lane_types(shape, S_)
    lens = len_ref[:]                                    # (TN, 1)
    s_last = PAD + 4 * ulen_ref[:] + 2                   # final blank lane
    fmask = (cols <= s_last) & (cols >= s_last - 3)
    same = same_ref[:]                                   # (TN, SPP) bool

    @pl.when(j == 0)
    def _():
        a0 = jnp.where(cols < PAD, 0.0, NEG)
        a0 = jnp.where(cols == PAD + S_, SENTINEL, a0)
        alpha_ref[:] = a0
        final_ref[:] = jnp.full_like(final_ref, NEG)

    def step(k, _):
        t = j * TT + k
        em_t = em_ref[:, k, :]                           # (TN, SPP)
        a = alpha_ref[:]

        from_prev_label = _shift_right(a, 4)
        from_first_blank = _shift_right(a, 3)
        from_star = _shift_right(a, 2)
        from_prev = _shift_right(a, 1)
        from_self = a
        from_star_blank = _shift_left(a, 1)

        from_prev_or_self = _lse(from_prev, from_self)
        reach = _lse(from_first_blank, from_prev, from_star)
        into_blank = from_prev_or_self
        into_star = _lse(from_prev_or_self, from_star_blank) + penalty
        into_label = jnp.where(same, reach,
                               _lse(reach, from_prev_label))

        trans = jnp.where(is_blank, into_blank,
                          jnp.where(is_star, into_star, into_label))
        new = jnp.where(real, trans + em_t, NEG)
        new = jnp.where(cols == PAD + S_, SENTINEL, new)
        alpha = jnp.where(t < lens, new, a)
        alpha_ref[:] = alpha
        hist_ref[:, k, :] = alpha

        masked = jnp.where(fmask, alpha, NEG)
        m = jnp.max(masked, -1, keepdims=True)
        fin = m + jnp.log(jnp.sum(jnp.exp(masked - m), -1, keepdims=True))
        final_ref[:] = jnp.where(t == lens - 1, fin, final_ref[:])
        return 0

    jax.lax.fori_loop(0, TT, step, 0)

    @pl.when(j == nt - 1)
    def _():
        loss_ref[:] = -final_ref[:]


def _star_bwd_kernel(em_ref, hist_ref, same_ref, len_ref, ulen_ref,
                     loss_ref, g_ref, dem_ref, q_ref, *, TT, SPP, S_,
                     penalty):
    """Reverse sweep on the transposed stencil. q holds
    beta_{t+1} + em_{t+1} + pen(lane) so each edge p->q contributes
    shift(q + edge-mask-at-q)."""
    j = pl.program_id(1)
    shape = (em_ref.shape[0], SPP)
    cols, real, is_blank, is_star, is_label = _lane_types(shape, S_)
    lens = len_ref[:]
    s_last = PAD + 4 * ulen_ref[:] + 2
    flog = jnp.where((cols <= s_last) & (cols >= s_last - 3), 0.0, NEG)
    same = same_ref[:]
    pen = jnp.where(is_star, penalty, 0.0)

    # additive masks evaluated at the EDGE TARGET q, per source offset:
    # q=p   : self-loop feeds blanks and stars (from_prev_or_self)
    # q=p+1 : from_prev feeds every state type
    # q=p+2 : from_star -> labels (via reach)
    # q=p+3 : from_first_blank -> labels
    # q=p+4 : from_prev_label -> labels that differ from the previous
    # q=p-1 : the blank AFTER a star feeds it back (from_star_blank)
    m0 = jnp.where(is_blank | is_star, 0.0, NEG)
    m1 = jnp.where(real, 0.0, NEG)
    m2 = jnp.where(is_label, 0.0, NEG)
    m3 = jnp.where(is_label, 0.0, NEG)
    m4 = jnp.where(is_label & ~same, 0.0, NEG)
    mm1 = jnp.where(is_star, 0.0, NEG)

    logZ = -loss_ref[:]                                  # (TN, 1)
    g = g_ref[:]

    @pl.when(j == 0)
    def _():
        q_ref[:] = jnp.full_like(q_ref, NEG)

    nt = pl.num_programs(1)
    tile_t0 = (nt - 1 - j) * TT

    def step(kk, _):
        k = TT - 1 - kk
        t = tile_t0 + k
        qc = q_ref[:]
        beta_rec = _lse(qc + m0,
                        _shift_left(qc + m1, 1),
                        _shift_left(qc + m2, 2),
                        _shift_left(qc + m3, 3),
                        _shift_left(qc + m4, 4),
                        _shift_right(qc + mm1, 1))
        beta_t = jnp.where(t == lens - 1, flog, beta_rec)
        active = t < lens
        alpha_t = hist_ref[:, k, :]
        dem = -g * jnp.exp(jnp.clip(alpha_t + beta_t - logZ, -60.0, 60.0))
        dem_ref[:, k, :] = jnp.where(active & real, dem, 0.0)
        q_ref[:] = jnp.where(active, em_ref[:, k, :] + pen + beta_t, qc)
        return 0

    jax.lax.fori_loop(0, TT, step, 0)


def _prepare(star_lp, star_targets, TN, TT):
    """Gather star emissions into the padded trellis lane layout."""
    T, N, C2 = star_lp.shape
    ext = intersperse_blanks(star_targets)               # (N, S_)
    S_ = ext.shape[1]
    pos = jnp.arange(S_)
    prev_label = jnp.pad(ext, ((0, 0), (4, 0)),
                         constant_values=-1)[:, :S_]
    same = (pos[None, :] % 4 == 3) & (ext == prev_label)  # (N, S_)

    onehot = jax.nn.one_hot(ext, C2, dtype=star_lp.dtype)
    em = jnp.einsum('tnc,nsc->nts', star_lp, onehot,
                    precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32)   # (N, T, S_)

    SPP = _round_up(PAD + S_ + 1, 128)
    NP = _round_up(N, TN)
    TP = _round_up(T, TT)
    em = jnp.pad(em, ((0, NP - N), (0, TP - T), (PAD, SPP - PAD - S_)),
                 constant_values=NEG)
    same = jnp.pad(same, ((0, NP - N), (PAD, SPP - PAD - S_)))
    return ext, em, same, S_, SPP, NP, TP


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _star_lattice(star_lp, star_targets, input_lengths, target_lengths,
                  penalty, interpret=False):
    """(T, N, 2V) star-vocabulary emissions -> (N,) positive NLL."""
    loss, _ = _lattice_fwd(star_lp, star_targets, input_lengths,
                           target_lengths, penalty, interpret)
    return loss


def _lattice_fwd(star_lp, star_targets, input_lengths, target_lengths,
                 penalty, interpret):
    T, N, C2 = star_lp.shape
    S_full = 4 * ((star_targets.shape[1] - 1) // 2) + 3
    TN, TT, _ = _tiles(N, T, S_full + PAD + 1)
    ext, em, same, S_, SPP, NP, TP = _prepare(
        star_lp.astype(jnp.float32), star_targets, TN, TT)
    lens = jnp.pad(input_lengths.astype(jnp.int32), (0, NP - N),
                   constant_values=1)[:, None]
    ulens = jnp.pad(target_lengths.astype(jnp.int32), (0, NP - N))[:, None]

    grid = (NP // TN, TP // TT)
    kernel = functools.partial(_star_fwd_kernel, TT=TT, SPP=SPP, S_=S_,
                               penalty=penalty)
    hist, loss = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TN, TT, SPP), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TN, SPP), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TN, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TN, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TN, TT, SPP), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TN, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((NP, TP, SPP), jnp.float32),
            jax.ShapeDtypeStruct((NP, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((TN, SPP), jnp.float32),
            pltpu.VMEM((TN, 1), jnp.float32),
        ],
        interpret=_interp(interpret),
    )(em, same, lens, ulens)
    loss_n = loss[:N, 0]
    res = (ext, em, same, hist, input_lengths, target_lengths, loss_n,
           (T, N, C2, S_, TN, TT, SPP, NP, TP))
    return loss_n, res


def _lattice_bwd(penalty, interpret, res, g):
    (ext, em, same, hist, input_lengths, target_lengths, loss,
     (T, N, C2, S_, TN, TT, SPP, NP, TP)) = res
    lens = jnp.pad(input_lengths.astype(jnp.int32), (0, NP - N),
                   constant_values=1)[:, None]
    ulens = jnp.pad(target_lengths.astype(jnp.int32), (0, NP - N))[:, None]
    gp = jnp.pad(g.astype(jnp.float32), (0, NP - N))[:, None]
    lossp = jnp.pad(loss, (0, NP - N))[:, None]

    grid = (NP // TN, TP // TT)
    nt = TP // TT
    kernel = functools.partial(_star_bwd_kernel, TT=TT, SPP=SPP, S_=S_,
                               penalty=penalty)
    dem = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TN, TT, SPP), lambda i, j: (i, nt - 1 - j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TN, TT, SPP), lambda i, j: (i, nt - 1 - j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TN, SPP), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TN, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TN, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TN, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TN, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TN, TT, SPP),
                               lambda i, j: (i, nt - 1 - j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NP, TP, SPP), jnp.float32),
        scratch_shapes=[pltpu.VMEM((TN, SPP), jnp.float32)],
        interpret=_interp(interpret),
    )(em, hist, same, lens, ulens, lossp, gp)

    dem = dem[:N, :T, PAD:PAD + S_]                       # (N, T, S_)
    onehot = jax.nn.one_hot(ext, C2, dtype=jnp.float32)
    dstar_lp = jnp.einsum('nts,nsc->tnc', dem, onehot,
                          precision=jax.lax.Precision.HIGHEST,
                          preferred_element_type=jnp.float32)
    return dstar_lp, None, None, None


_star_lattice.defvjp(lambda lp, tg, il, tl, pen, interp:
                     _lattice_fwd(lp, tg, il, tl, pen, interp),
                     _lattice_bwd)


def star_ctc_loss_pallas(log_probs, targets, input_lengths,
                         target_lengths, star_penalty=-0.5,
                         interpret=False):
    """Drop-in for ops/star.star_ctc_forward_score. The star-vocabulary
    construction (differentiable logsumexp/logsubexp) runs in XLA; the
    lattice fwd+bwd are the fused kernels above."""
    star_lp, star_targets = intersperse_stars(log_probs, targets)
    return _star_lattice(star_lp, star_targets, input_lengths,
                         target_lengths, float(star_penalty), interpret)
