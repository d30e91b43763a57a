"""Fused CTC forward-backward as Pallas TPU kernels.

The lax.scan path (ops/ctc.py, the oracle for this kernel) round-trips
the (N, S') alpha vector and per-step residuals through HBM on every
one of T steps, and its autodiff backward re-materializes the whole
trellis. These kernels keep alpha resident in VMEM across the entire
time axis (grid: batch tiles x time tiles, time sequential), stream the
gathered emissions once, and implement the analytic backward recursion
(beta') directly — d loss / d em flows out in one reverse sweep.

Replaces the spec of ha/ctc.py:110-174 (batched trellis) with the
fused-lattice design SURVEY.md §7 stage 6 calls for. Parity oracle:
ops/ctc.ctc_forward_score (tested against torch F.ctc_loss in
tests/test_ctc.py).

Layout: emissions are pre-gathered outside the kernel to (N, T, S')
where S' = 2*max_targets+1 padded to a lane multiple — the kernel never
touches the vocabulary axis, so it works for any V. The backward
scatters d_em back to (T, N, C) with one XLA scatter-add.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from haloop_tpu.ops.ctc import intersperse_blanks

NEG = -1e9            # big-finite: alpha accumulates it for T steps


def _round_up(n, m):
    return (n + m - 1) // m * m


def _interp(flag):
    """Interpret off-TPU so forced dispatch (HALOOP_KERNELS=1) and CPU
    tests run the same kernel code."""
    if flag:
        return True
    try:
        return jax.default_backend() != "tpu"
    except Exception:
        return True


def _lse3(a, b, c):
    m = jnp.maximum(jnp.maximum(a, b), c)
    return m + jnp.log(jnp.exp(a - m) + jnp.exp(b - m) + jnp.exp(c - m))


def _shift_right(x, n):
    """x[..., s] <- x[..., s-n] with NEG fill (lane axis)."""
    cols = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    return jnp.where(cols < n, NEG, pltpu.roll(x, n, axis=x.ndim - 1))


def _shift_left(x, n):
    cols = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    S = x.shape[-1]
    # pltpu.roll requires a non-negative shift; left by n == right by S-n
    return jnp.where(cols >= S - n, NEG,
                     pltpu.roll(x, S - n, axis=x.ndim - 1))


def _ctc_fwd_kernel(em_ref, skip_ref, len_ref, ulen_ref, hist_ref,
                    loss_ref, alpha_ref, final_ref, *, TT, SP):
    j = pl.program_id(1)
    nt = pl.num_programs(1)
    cols = jax.lax.broadcasted_iota(jnp.int32, (em_ref.shape[0], SP), 1)
    lens = len_ref[:]                                    # (TN, 1)
    s_last = 2 * ulen_ref[:]                             # (TN, 1)
    fmask = (cols == s_last) | ((cols == s_last - 1) & (s_last > 0))
    allow_skip = jnp.where(skip_ref[:], NEG, 0.0)        # 0 where skip OK

    @pl.when(j == 0)
    def _():
        alpha_ref[:] = jnp.zeros_like(alpha_ref)         # set at t=0 below
        final_ref[:] = jnp.full_like(final_ref, NEG)

    def step(k, _):
        t = j * TT + k
        em_t = em_ref[:, k, :]                           # (TN, SP)
        alpha = alpha_ref[:]

        from1 = _shift_right(alpha, 1)
        from2 = _shift_right(alpha, 2) + allow_skip
        new = _lse3(alpha, from1, from2) + em_t
        # t == 0: only states 0 (blank) and 1 (first label) start
        init = jnp.where(cols < 2, em_t, NEG)
        new = jnp.where(t == 0, init, new)
        alpha = jnp.where(t < lens, new, alpha)
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


def _ctc_bwd_kernel(em_ref, hist_ref, skip_ref, len_ref, ulen_ref,
                    loss_ref, g_ref, dem_ref, q_ref, *, TT, SP):
    """Time-reversed sweep: beta' recursion + d loss / d em in place."""
    j = pl.program_id(1)
    cols = jax.lax.broadcasted_iota(jnp.int32, (em_ref.shape[0], SP), 1)
    lens = len_ref[:]
    s_last = 2 * ulen_ref[:]
    flog = jnp.where((cols == s_last) |
                     ((cols == s_last - 1) & (s_last > 0)), 0.0, NEG)
    # transition s -> s+2 exists iff the skip into state s+2 is allowed
    allowL2 = jnp.where(_shift_left(jnp.where(skip_ref[:], NEG, 0.0), 2)
                        >= -0.5, 0.0, NEG)
    logZ = -loss_ref[:]                                   # (TN, 1)
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
        beta_rec = _lse3(qc, _shift_left(qc, 1),
                         _shift_left(qc, 2) + allowL2)
        beta_t = jnp.where(t == lens - 1, flog, beta_rec)
        active = t < lens
        alpha_t = hist_ref[:, k, :]
        dem = -g * jnp.exp(jnp.clip(alpha_t + beta_t - logZ, -60.0, 60.0))
        dem_ref[:, k, :] = jnp.where(active, dem, 0.0)
        q_ref[:] = jnp.where(active, em_ref[:, k, :] + beta_t, qc)
        return 0

    jax.lax.fori_loop(0, TT, step, 0)


def _prepare(log_probs, targets, target_lengths, TN, TT):
    """Host-of-kernel prep: gather emissions into trellis layout.

    The gather rides the MXU as a one-hot matmul — an XLA gather at
    this shape costs ~10ms on v5e (the whole scan path's budget!), the
    batched (T, C) @ (C, S') matmul is ~100x cheaper."""
    T, N, C = log_probs.shape
    ext = intersperse_blanks(targets)                     # (N, S_)
    S_ = ext.shape[1]
    prev = jnp.pad(ext, ((0, 0), (2, 0)), constant_values=-1)[:, :S_]
    no_skip = (ext == 0) | (ext == prev)                  # (N, S_) bool

    onehot = jax.nn.one_hot(ext, C, dtype=log_probs.dtype)  # (N, S_, C)
    em = jnp.einsum('tnc,nsc->nts', log_probs, onehot,
                    precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32)   # (N, T, S_)

    SP = _round_up(S_, 128)
    NP = _round_up(N, TN)
    TP = _round_up(T, TT)
    em = jnp.pad(em, ((0, NP - N), (0, TP - T), (0, SP - S_)),
                 constant_values=NEG)
    no_skip = jnp.pad(no_skip, ((0, NP - N), (0, SP - S_)),
                      constant_values=True)
    return ext, em, no_skip, SP, NP, TP


def _fwd_call(em, no_skip, input_lengths, target_lengths, N, TN, TT, SP,
              NP, TP, interpret):
    lens = jnp.pad(input_lengths.astype(jnp.int32), (0, NP - N),
                   constant_values=1)[:, None]
    ulens = jnp.pad(target_lengths.astype(jnp.int32), (0, NP - N))[:, None]
    grid = (NP // TN, TP // TT)
    kernel = functools.partial(_ctc_fwd_kernel, TT=TT, SP=SP)
    hist, loss = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TN, TT, SP), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TN, SP), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TN, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TN, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TN, TT, SP), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TN, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((NP, TP, SP), jnp.float32),
            jax.ShapeDtypeStruct((NP, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((TN, SP), jnp.float32),
            pltpu.VMEM((TN, 1), jnp.float32),
        ],
        interpret=_interp(interpret),
    )(em, no_skip, lens, ulens)
    return hist, loss


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def ctc_loss_pallas(log_probs, targets, input_lengths, target_lengths,
                    interpret=False):
    """Drop-in for ops/ctc.ctc_forward_score: (T, N, C) log-softmax
    emissions -> (N,) positive NLL, fused Pallas trellis fwd+bwd."""
    loss, _ = _ctc_fwd(log_probs, targets, input_lengths, target_lengths,
                       interpret)
    return loss


def _tiles(N, T, S_):
    """The trellis recurrence is sequential over time AND over grid
    steps (one TPU core), so put the WHOLE batch in one tile — per-step
    VPU work scales with TN while the dependent-step count stays T.
    Time-tile length is then budgeted so an em/hist block stays ~4MB."""
    SP = _round_up(S_, 128)
    TN = min(_round_up(N, 8), 128)

    # the backward pipelines 3 such blocks (em, alpha-history, dem),
    # each double-buffered, plus kernel temporaries — budget ~1.25MB
    # per block to stay inside the 16MB VMEM
    def tt_for(tn):
        return min(_round_up(T, 8), (5 * 2 ** 18 // (tn * SP * 4)) // 8 * 8)

    # long-target batches (large SP): shrink the batch tile until at
    # least one 8-step time tile fits the budget — a hard TT floor
    # would override the budget and fail Mosaic compilation at S >= 448
    while TN > 8 and tt_for(TN) < 8:
        TN = max(8, (TN // 2) // 8 * 8)
    TT = max(8, tt_for(TN))
    return TN, TT, SP


def _ctc_fwd(log_probs, targets, input_lengths, target_lengths, interpret):
    T, N, C = log_probs.shape
    TN, TT, _ = _tiles(N, T, 2 * targets.shape[1] + 1)
    ext, em, no_skip, SP, NP, TP = _prepare(
        log_probs.astype(jnp.float32), targets, target_lengths, TN, TT)
    hist, loss = _fwd_call(em, no_skip, input_lengths, target_lengths,
                           N, TN, TT, SP, NP, TP, interpret)
    loss = loss[:N, 0]
    res = (ext, em, no_skip, hist, input_lengths, target_lengths,
           loss, (T, N, C, TN, TT, SP, NP, TP))
    return loss, res


def _ctc_bwd(interpret, res, g):
    (ext, em, no_skip, hist, input_lengths, target_lengths, loss,
     (T, N, C, TN, TT, SP, NP, TP)) = res
    lens = jnp.pad(input_lengths.astype(jnp.int32), (0, NP - N),
                   constant_values=1)[:, None]
    ulens = jnp.pad(target_lengths.astype(jnp.int32), (0, NP - N))[:, None]
    # upstream grad on the POSITIVE loss: d(-logZ)/dem = -exp(...)
    gp = jnp.pad(g.astype(jnp.float32), (0, NP - N))[:, None]
    lossp = jnp.pad(loss, (0, NP - N))[:, None]

    grid = (NP // TN, TP // TT)
    kernel = functools.partial(_ctc_bwd_kernel, TT=TT, SP=SP)
    nt = TP // TT
    dem = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TN, TT, SP), lambda i, j: (i, nt - 1 - j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TN, TT, SP), lambda i, j: (i, nt - 1 - j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TN, SP), lambda i, j: (i, 0),
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
        out_specs=pl.BlockSpec((TN, TT, SP), lambda i, j: (i, nt - 1 - j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NP, TP, SP), jnp.float32),
        scratch_shapes=[pltpu.VMEM((TN, SP), jnp.float32)],
        interpret=_interp(interpret),
    )(em, hist, no_skip, lens, ulens, lossp, gp)

    dem = dem[:N, :T, :ext.shape[1]]                      # (N, T, S_)
    # scatter d_em back over the vocabulary as a one-hot matmul (MXU;
    # an XLA scatter-add here is ~10ms): dlogp[t, n, c] =
    # sum_{s: ext[n,s]==c} dem[n, t, s]
    onehot = jax.nn.one_hot(ext, C, dtype=jnp.float32)    # (N, S_, C)
    dlogp = jnp.einsum('nts,nsc->tnc', dem, onehot,
                       precision=jax.lax.Precision.HIGHEST,
                       preferred_element_type=jnp.float32)
    return dlogp, None, None, None


ctc_loss_pallas.defvjp(_ctc_fwd, _ctc_bwd)
