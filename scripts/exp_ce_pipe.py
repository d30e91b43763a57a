"""Experiment: software-pipelined fused-CE kernel (VPU/MXU overlap).

The production CE kernel (ops/fused_ce.py) measures flat ~121 TFLOP/s
across (tn, tv) tile sweeps — co-bound by the MXU matmul and the
per-tile exp/max/sum VPU pass that *depends on it* (PERFORMANCE.md
"roofline accounting"). This variant breaks the dependency chain with
a one-step software pipeline: at grid step j the kernel first updates
the online-softmax stats from tile j-1's logits (held in VMEM scratch,
VPU work, independent of step j's matmul) and then computes tile j's
matmul into the scratch (MXU work) — giving Mosaic's scheduler two
independent instruction streams to interleave.

Run on the chip:  python scripts/exp_ce_pipe.py
"""

import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")

from haloop_tpu.ops.fused_ce import _fused_ce_fwd_impl, NEG, _round_up


def _stats_update(logits, col, tgt, m_ref, s_ref, g_ref):
    m_old = m_ref[:]
    m_new = jnp.maximum(m_old, jnp.max(logits, -1, keepdims=True))
    s_ref[:] = s_ref[:] * jnp.exp(m_old - m_new) + \
        jnp.sum(jnp.exp(logits - m_new), -1, keepdims=True)
    m_ref[:] = m_new
    hit = col == tgt
    g_ref[:] = g_ref[:] + jnp.sum(jnp.where(hit, logits, 0.0), -1,
                                  keepdims=True)


def _ce_kernel_pipe(x_ref, w_ref, t_ref, nll_ref, lse_ref,
                    m_ref, s_ref, g_ref, l_ref, *, V, TV, out_dtype):
    j = pl.program_id(1)
    nv = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG)
        s_ref[:] = jnp.zeros_like(s_ref)
        g_ref[:] = jnp.zeros_like(g_ref)

    tgt = t_ref[:]

    # consume tile j-1 (VPU; reads scratch, independent of this step's dot)
    @pl.when(j > 0)
    def _():
        col = jax.lax.broadcasted_iota(
            jnp.int32, l_ref.shape, 1) + (j - 1) * TV
        _stats_update(l_ref[:], col, tgt, m_ref, s_ref, g_ref)

    # produce tile j (MXU)
    logits = jnp.dot(x_ref[:], w_ref[:].T,
                     preferred_element_type=jnp.float32)
    col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1) + j * TV
    l_ref[:] = jnp.where(col < V, logits, NEG)

    # drain: the last tile is produced and consumed in the same step
    @pl.when(j == nv - 1)
    def _():
        colz = jax.lax.broadcasted_iota(
            jnp.int32, l_ref.shape, 1) + j * TV
        _stats_update(l_ref[:], colz, tgt, m_ref, s_ref, g_ref)
        lse = m_ref[:] + jnp.log(s_ref[:])
        nll_ref[:] = (lse - g_ref[:]).astype(out_dtype)
        lse_ref[:] = lse.astype(out_dtype)


def fused_ce_pipe(x, w, targets, *, tn=256, tv=2048):
    N, D = x.shape
    V = w.shape[0]
    NP, VP, DP = _round_up(N, tn), _round_up(V, tv), _round_up(D, 128)
    if DP != D:
        x = jnp.pad(x, ((0, 0), (0, DP - D)))
        w = jnp.pad(w, ((0, 0), (0, DP - D)))
    if NP != N:
        x = jnp.pad(x, ((0, NP - N), (0, 0)))
        targets = jnp.pad(targets, (0, NP - N))
    if VP != V:
        w = jnp.pad(w, ((0, VP - V), (0, 0)))
    t2 = targets.astype(jnp.int32)[:, None]
    grid = (NP // tn, VP // tv)
    kernel = functools.partial(_ce_kernel_pipe, V=V, TV=tv,
                               out_dtype=jnp.float32)
    nll, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tn, DP), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tv, DP), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tn, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((NP, 1), jnp.float32),
            jax.ShapeDtypeStruct((NP, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((tn, 1), jnp.float32),
            pltpu.VMEM((tn, 1), jnp.float32),
            pltpu.VMEM((tn, 1), jnp.float32),
            pltpu.VMEM((tn, tv), jnp.float32),
        ],
        interpret=jax.default_backend() != "tpu",
    )(x, w, t2)
    return nll[:N, 0], lse[:N, 0]


def timeit(fn, *args, iters=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    float(jnp.sum(out[0]))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(out[0]))
    return (time.perf_counter() - t0) / iters


def main():
    rng = np.random.default_rng(0)
    N, D, V = 16384, 768, 50257
    x = jnp.asarray(rng.standard_normal((N, D)).astype(np.float32) * 0.02,
                    jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((V, D)).astype(np.float32) * 0.02,
                    jnp.bfloat16)
    t = jnp.asarray(rng.integers(1, 50000, (N,)).astype(np.int32))

    base = jax.jit(lambda x, w, t: _fused_ce_fwd_impl(x, w, t))
    n0, l0 = base(x, w, t)

    flops = 2 * N * D * V
    print(f"backend={jax.default_backend()}  N={N} D={D} V={V}")
    for tn, tv in ((256, 2048), (256, 4096), (512, 2048), (128, 2048),
                   (256, 1024)):
        pipe = jax.jit(functools.partial(fused_ce_pipe, tn=tn, tv=tv))
        n1, l1 = pipe(x, w, t)
        err = float(jnp.max(jnp.abs(n1 - n0)))
        dt = timeit(pipe, x, w, t)
        print(f"pipe  (tn={tn:4d}, tv={tv:4d}): {dt*1e3:6.2f} ms "
              f"{flops/dt/1e12:6.1f} TFLOP/s  max|dnll|={err:.2e}",
              flush=True)
    dt = timeit(base, x, w, t)
    print(f"base  (tn= 256, tv=2048): {dt*1e3:6.2f} ms "
          f"{flops/dt/1e12:6.1f} TFLOP/s", flush=True)


if __name__ == "__main__":
    main()
