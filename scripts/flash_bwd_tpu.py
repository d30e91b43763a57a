"""Validate + time the kernelized flash backward on the real TPU."""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from haloop_tpu.ops.flash import flash_attention, _reference


def main():
    rng = np.random.default_rng(0)
    N, H, T, D = 4, 8, 1024, 64
    q = jnp.asarray(rng.normal(size=(N, H, T, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(N, H, T, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(N, H, T, D)).astype(np.float32))
    kvl = jnp.asarray(np.array([T, T - 100, T - 333, T // 2], np.int32))

    for causal in ([] if len(sys.argv) > 1 else (False, True)):
        gf = jax.jit(jax.grad(lambda q, k, v: jnp.sum(
            flash_attention(q, k, v, kvl, causal, 0) ** 2),
            argnums=(0, 1, 2)))(q, k, v)
        gr = jax.jit(jax.grad(lambda q, k, v: jnp.sum(
            _reference(q, k, v, kvl, causal, 0) ** 2),
            argnums=(0, 1, 2)))(q, k, v)
        diffs = [float(jnp.abs(a - b).max()) for a, b in zip(gf, gr)]
        print(f"causal={causal} grad diffs vs reference:",
              [f"{d:.2e}" for d in diffs], flush=True)

    # timing fwd+bwd at T=4096 bf16 causal
    T2 = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    q2 = jnp.asarray(rng.normal(size=(N, H, T2, D)), dtype=jnp.bfloat16)
    k2 = jnp.asarray(rng.normal(size=(N, H, T2, D)), dtype=jnp.bfloat16)
    v2 = jnp.asarray(rng.normal(size=(N, H, T2, D)), dtype=jnp.bfloat16)
    kvl2 = jnp.full((N,), T2, jnp.int32)

    fl = jax.jit(jax.grad(lambda q, k, v: jnp.sum(
        flash_attention(q, k, v, kvl2, True, 0).astype(jnp.float32)),
        argnums=(0, 1, 2)))
    rf = jax.jit(jax.grad(lambda q, k, v: jnp.sum(
        _reference(q, k, v, kvl2, True, 0).astype(jnp.float32)),
        argnums=(0, 1, 2)))

    for name, fn in (("flash fwd+bwd", fl), ("reference fwd+bwd", rf)):
        g = fn(q2, k2, v2)
        float(jnp.sum(g[0].astype(jnp.float32)))
        t0 = time.perf_counter()
        for _ in range(10):
            g = fn(q2, k2, v2)
        float(jnp.sum(g[0].astype(jnp.float32)))
        dt = (time.perf_counter() - t0) / 10
        print(f"{name}: {dt*1000:.2f} ms/iter (T={T2} causal bf16)",
              flush=True)


if __name__ == '__main__':
    main()
