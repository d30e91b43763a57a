"""Fused-CE kernel vs materialized-logits path on the current backend,
GPT-2 Small lm_head shapes (hap hot spot). Timing ends with a value
fetch (axon's block_until_ready returns early)."""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from haloop_tpu.ops.fused_ce import fused_ce_nll, reference_ce_nll


def bench(fn, *args, iters=20):
    out = fn(*args)
    float(jnp.sum(out))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(out))
    return (time.perf_counter() - t0) / iters


def main():
    rng = np.random.default_rng(0)
    N, D, V = 32 * 512, 768, 50257
    x = jnp.asarray(rng.normal(size=(N, D)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    w = jnp.asarray((rng.normal(size=(V, D)) * 0.02).astype(np.float32)
                    ).astype(jnp.bfloat16)
    t = jnp.asarray(rng.integers(1, V, N).astype(np.int32))

    ref = jax.jit(reference_ce_nll)
    a = np.asarray(ref(x, w, t))
    for tn, tv in [(256, 1024), (512, 1024), (256, 2048), (512, 2048),
                   (1024, 1024)]:
        from haloop_tpu.ops.fused_ce import _fused_ce_fwd_impl
        fused = jax.jit(lambda x, w, t, tn=tn, tv=tv: _fused_ce_fwd_impl(
            x, w, t, tn=tn, tv=tv)[0])
        b = np.asarray(fused(x, w, t))
        err = np.max(np.abs(a - b))
        dt = bench(fused, x, w, t)
        tf = 2 * N * D * V / dt / 1e12
        print(f"fused tn={tn} tv={tv}: {dt*1000:.2f} ms  {tf:.1f} TFLOP/s "
              f"(err {err:.4f})", flush=True)
    dt = bench(ref, x, w, t)
    print(f"materialized: {dt*1000:.2f} ms  "
          f"{2*N*D*V/dt/1e12:.1f} TFLOP/s", flush=True)


if __name__ == "__main__":
    main()
