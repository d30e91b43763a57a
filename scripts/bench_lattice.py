"""Pallas lattice kernels vs the lax.scan paths on the current backend:
CTC trellis (fwd + grad) at hac shapes and the RNN-T fused joint-lse
(fwd + grad) at transducer shapes. Value-fetch timing (axon quirk)."""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from haloop_tpu.ops.ctc import ctc_forward_score
from haloop_tpu.ops.ctc_pallas import ctc_loss_pallas
from haloop_tpu.ops.joint_pallas import pairwise_lse, pairwise_lse_reference


def bench(fn, *args, iters=20):
    out = fn(*args)
    jax.tree.map(lambda x: float(jnp.sum(x.astype(jnp.float32))), out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.tree.map(lambda x: float(jnp.sum(x.astype(jnp.float32))), out)
    return (time.perf_counter() - t0) / iters


def main():
    rng = np.random.default_rng(0)

    print("== CTC: scan vs pallas ==", flush=True)
    for T, N, C, U in [(300, 48, 512, 24), (300, 48, 512, 48),
                       (750, 96, 512, 64)]:
        lp = jax.nn.log_softmax(jnp.asarray(
            rng.normal(size=(T, N, C)).astype(np.float32)), -1)
        tg = jnp.asarray(rng.integers(1, C, (N, U)).astype(np.int32))
        il = jnp.asarray(rng.integers(T // 2, T + 1, N).astype(np.int32))
        tl = jnp.asarray(rng.integers(U // 2, U + 1, N).astype(np.int32))

        scan_f = jax.jit(ctc_forward_score)
        pal_f = jax.jit(lambda lp, tg, il, tl: ctc_loss_pallas(
            lp, tg, il, tl))
        a, b = np.asarray(scan_f(lp, tg, il, tl)), \
            np.asarray(pal_f(lp, tg, il, tl))
        err = np.max(np.abs(a - b))
        d1, d2 = bench(scan_f, lp, tg, il, tl), bench(pal_f, lp, tg, il, tl)

        scan_g = jax.jit(jax.grad(
            lambda lp: jnp.sum(ctc_forward_score(lp, tg, il, tl))))
        pal_g = jax.jit(jax.grad(
            lambda lp: jnp.sum(ctc_loss_pallas(lp, tg, il, tl))))
        ga, gb = np.asarray(scan_g(lp)), np.asarray(pal_g(lp))
        gerr = np.max(np.abs(ga - gb))
        g1, g2 = bench(scan_g, lp), bench(pal_g, lp)
        print(f"T={T} N={N} C={C} U={U}: fwd scan {d1*1e3:.2f} pallas "
              f"{d2*1e3:.2f} ms ({d1/d2:.2f}x, err {err:.4f}) | grad scan "
              f"{g1*1e3:.2f} pallas {g2*1e3:.2f} ms ({g1/g2:.2f}x, "
              f"gerr {gerr:.5f})", flush=True)

    print("== RNN-T joint lse: materialized vs pallas ==", flush=True)
    for N, T, U1, V in [(8, 300, 25, 512), (16, 300, 25, 1024)]:
        f = jnp.asarray(rng.normal(size=(N, T, V)).astype(np.float32))
        g = jnp.asarray(rng.normal(size=(N, U1, V)).astype(np.float32))
        dl = jnp.asarray(rng.normal(size=(N, T, U1)).astype(np.float32))

        mat = jax.jit(pairwise_lse_reference)
        pal = jax.jit(lambda f, g: pairwise_lse(f, g))
        err = float(jnp.max(jnp.abs(mat(f, g) - pal(f, g))))
        d1, d2 = bench(mat, f, g), bench(pal, f, g)

        mat_g = jax.jit(jax.grad(
            lambda f, g: jnp.sum(pairwise_lse_reference(f, g) * dl),
            (0, 1)))
        pal_g = jax.jit(jax.grad(
            lambda f, g: jnp.sum(pairwise_lse(f, g) * dl), (0, 1)))
        g1, g2 = bench(mat_g, f, g), bench(pal_g, f, g)
        print(f"N={N} T={T} U1={U1} V={V}: fwd mat {d1*1e3:.2f} pallas "
              f"{d2*1e3:.2f} ms ({d1/d2:.2f}x, err {err:.5f}) | grad mat "
              f"{g1*1e3:.2f} pallas {g2*1e3:.2f} ms ({g1/g2:.2f}x)",
              flush=True)


if __name__ == "__main__":
    main()
