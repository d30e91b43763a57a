"""Isolated LSTM recurrence: exact lax.scan (custom VJP) vs int8-resident
Pallas kernels, fwd and fwd+bwd, at the hac lstm:512 bench shape.
Value-fetch timing (axon quirk)."""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from haloop_tpu.nn.lstm import lstm_scan
from haloop_tpu.nn.lstm_pallas import lstm_scan_pallas, lstm_scan_q8


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
    T, B, H = 300, 48, 1536
    w = jnp.asarray((rng.normal(size=(4 * H, H)) * 0.02).astype(np.float32))
    xp = jnp.asarray(rng.normal(size=(T, B, 4 * H)).astype(np.float32)
                     ).astype(jnp.bfloat16)
    h0 = jnp.zeros((B, H), jnp.bfloat16)
    c0 = jnp.zeros((B, H), jnp.bfloat16)
    wb = w.astype(jnp.bfloat16)

    exact_f = jax.jit(lambda w, xp: lstm_scan(w, xp, h0, c0)[0])
    bf16_f = jax.jit(lambda w, xp: lstm_scan_pallas(w, xp, h0, c0, False)[0])
    q8_f = jax.jit(lambda w, xp: lstm_scan_q8(w, xp, h0, c0)[0])
    d1 = bench(exact_f, wb, xp)
    d3 = bench(bf16_f, w, xp)
    d2 = bench(q8_f, w, xp)
    print(f"fwd : scan {d1*1e3:.2f}  resident-bf16 {d3*1e3:.2f} "
          f"({d1/d3:.2f}x)  resident-q8 {d2*1e3:.2f} ms ({d1/d2:.2f}x)",
          flush=True)

    exact_g = jax.jit(jax.grad(
        lambda w, xp: jnp.sum(lstm_scan(w, xp, h0, c0)[0]
                              .astype(jnp.float32)), (0, 1)))
    bf16_g = jax.jit(jax.grad(
        lambda w, xp: jnp.sum(lstm_scan_pallas(w, xp, h0, c0, False)[0]
                              .astype(jnp.float32)), (0, 1)))
    q8_g = jax.jit(jax.grad(
        lambda w, xp: jnp.sum(lstm_scan_q8(w, xp, h0, c0)[0]
                              .astype(jnp.float32)), (0, 1)))
    g1 = bench(exact_g, wb, xp)
    g3 = bench(bf16_g, w, xp)
    g2 = bench(q8_g, w, xp)
    print(f"grad: scan {g1*1e3:.2f}  resident-bf16 {g3*1e3:.2f} "
          f"({g1/g3:.2f}x)  resident-q8 {g2*1e3:.2f} ms ({g1/g2:.2f}x)",
          flush=True)


if __name__ == "__main__":
    main()
