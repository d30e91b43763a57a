"""Validate + time the Pallas flash-attention kernel on the real TPU."""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from haloop_tpu.ops.flash import flash_attention, _reference


def main():
    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    N, H, T, D = 4, 8, 1024, 64
    q = jnp.asarray(rng.normal(size=(N, H, T, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(N, H, T, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(N, H, T, D)).astype(np.float32))
    kvl = jnp.asarray(np.array([T, T - 100, T - 333, T // 2], np.int32))

    for causal in (False, True):
        out = jax.jit(lambda q, k, v: flash_attention(
            q, k, v, kvl, causal, 0))(q, k, v)
        ref = jax.jit(lambda q, k, v: _reference(
            q, k, v, kvl, causal, 0))(q, k, v)
        diff = float(jnp.max(jnp.abs(out - ref)))
        print(f"causal={causal} max diff vs reference: {diff:.2e}",
              flush=True)

    # timing: flash vs materialized reference, longer sequence
    T2 = 4096
    q2 = jnp.asarray(rng.normal(size=(N, H, T2, D)),
                     dtype=jnp.bfloat16)
    k2 = jnp.asarray(rng.normal(size=(N, H, T2, D)), dtype=jnp.bfloat16)
    v2 = jnp.asarray(rng.normal(size=(N, H, T2, D)), dtype=jnp.bfloat16)
    kvl2 = jnp.full((N,), T2, jnp.int32)

    fl = jax.jit(lambda q, k, v: flash_attention(q, k, v, kvl2, True, 0))
    rf = jax.jit(lambda q, k, v: _reference(q, k, v, kvl2, True, 0))

    for name, fn in (("flash", fl), ("reference", rf)):
        x = fn(q2, k2, v2)
        float(jnp.sum(x.astype(jnp.float32)))  # force
        t0 = time.perf_counter()
        for _ in range(20):
            x = fn(q2, k2, v2)
        float(jnp.sum(x.astype(jnp.float32)))
        dt = (time.perf_counter() - t0) / 20
        print(f"{name}: {dt*1000:.2f} ms/iter (N={N},H={H},T={T2},D={D}, "
              f"causal bf16)", flush=True)


if __name__ == '__main__':
    main()
