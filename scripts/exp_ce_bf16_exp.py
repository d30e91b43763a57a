"""Final hap MFU lever (VERDICT r3 item 7): does computing the CE
kernel's online-softmax exp pass in bf16 buy anything?

The r3 roofline leaves hap at ~98% of its measured composite ceiling;
the residual is VPU exp/logsumexp work co-scheduled with the lm_head
matmul. Hypothesis to kill or confirm: a bf16 exp halves the VPU
element width and speeds the co-bound region. (Expected negative: the
TPU VPU computes in fp32 lanes; bf16 elementwise ops upcast anyway.)

A/B at the hap operating point (N=16384 tokens, D=768, V=50257),
one-scalar-fetch timing (axon tunnel rules, .claude/skills/verify).
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

from haloop_tpu.ops.fused_ce import (_fused_ce_fwd_impl, _round_up,
                                     pick_tv, NEG)


def _ce_kernel_bf16exp(x_ref, w_ref, t_ref, nll_ref, lse_ref, m_ref,
                       s_ref, g_ref, *, V, TV, out_dtype):
    j = pl.program_id(1)
    nv = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG)
        s_ref[:] = jnp.zeros_like(s_ref)
        g_ref[:] = jnp.zeros_like(g_ref)

    logits = jnp.dot(x_ref[:], w_ref[:].T,
                     preferred_element_type=jnp.float32)
    col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1) + j * TV
    logits = jnp.where(col < V, logits, NEG)

    m_old = m_ref[:]
    m_new = jnp.maximum(m_old, jnp.max(logits, -1, keepdims=True))
    # THE LEVER: the (TN, TV) exp runs on bf16 lanes; the running sum
    # stays fp32
    e = jnp.exp((logits - m_new).astype(jnp.bfloat16))
    s_ref[:] = s_ref[:] * jnp.exp(m_old - m_new) + \
        jnp.sum(e.astype(jnp.float32), -1, keepdims=True)
    m_ref[:] = m_new

    tgt = t_ref[:]
    hit = col == tgt
    g_ref[:] = g_ref[:] + jnp.sum(jnp.where(hit, logits, 0.0), -1,
                                  keepdims=True)

    @pl.when(j == nv - 1)
    def _():
        lse = m_ref[:] + jnp.log(s_ref[:])
        nll_ref[:] = (lse - g_ref[:]).astype(out_dtype)
        lse_ref[:] = lse.astype(out_dtype)


def fused_ce_bf16exp(x, w, targets, tn=256):
    N, D = x.shape
    V = w.shape[0]
    tv = pick_tv(D, x.dtype.itemsize, tn)
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
    kernel = functools.partial(_ce_kernel_bf16exp, V=V, TV=tv,
                               out_dtype=jnp.float32)
    nll, lse = pl.pallas_call(
        kernel,
        grid=(NP // tn, VP // tv),
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
        scratch_shapes=[pltpu.VMEM((tn, 1), jnp.float32)] * 3,
    )(x, w, t2)
    return nll[:N, 0], lse[:N, 0]


def timeit(fn, *args, iters=20):
    out = fn(*args)
    float(jnp.sum(out[0]))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(out[0]))
    return (time.perf_counter() - t0) / iters


def main():
    N, D, V = 16384, 768, 50257
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(N, D)), jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(V, D)) * 0.02, jnp.bfloat16)
    t = jnp.asarray(rng.integers(1, V, N), jnp.int32)

    base = jax.jit(lambda x, w, t: _fused_ce_fwd_impl(x, w, t))
    lever = jax.jit(fused_ce_bf16exp)

    tb = timeit(base, x, w, t)
    tl = timeit(lever, x, w, t)
    nb, _ = base(x, w, t)
    nl, _ = lever(x, w, t)
    err = float(jnp.max(jnp.abs(nb - nl)))
    print(f"fp32 exp CE kernel: {tb*1000:.2f} ms")
    print(f"bf16 exp CE kernel: {tl*1000:.2f} ms "
          f"({(tb/tl-1)*100:+.1f}% vs fp32)")
    print(f"max |nll diff|: {err:.4f} nats")


if __name__ == "__main__":
    main()
