"""Isolated LSTM recurrence: exact lax.scan (custom VJP) vs the
VMEM-resident Pallas kernels (bf16 and int8 modes), fwd and fwd+bwd, at
the hac lstm:512 bench shape.

Methodology: every timed function reduces to ONE scalar INSIDE jit and
the timing region closes with a single float() fetch — per-leaf host
fetches through the axon remote tunnel cost ~ms each and otherwise
dominate grad timings (a 75-leaf GPT grad fetch measures 300 ms of
pure tunnel traffic)."""

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
    float(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(out)
    return (time.perf_counter() - t0) / iters


def fwd_scalar(fn):
    return jax.jit(lambda w, xp: jnp.sum(fn(w, xp)[0].astype(jnp.float32)))


def grad_scalar(fn):
    def f(w, xp):
        gw, gx = jax.grad(
            lambda w, xp: jnp.sum(fn(w, xp)[0].astype(jnp.float32)),
            (0, 1))(w, xp)
        return jnp.sum(gw.astype(jnp.float32)) + \
            jnp.sum(gx.astype(jnp.float32))
    return jax.jit(f)


def main():
    rng = np.random.default_rng(0)
    T, B, H = 300, 48, 1536
    w = jnp.asarray((rng.normal(size=(4 * H, H)) * 0.02).astype(np.float32))
    xp = jnp.asarray(rng.normal(size=(T, B, 4 * H)).astype(np.float32)
                     ).astype(jnp.bfloat16)
    h0 = c0 = jnp.zeros((B, H), jnp.bfloat16)
    wb = w.astype(jnp.bfloat16)

    scan = lambda w, xp: lstm_scan(w, xp, h0, c0)
    bf16 = lambda w, xp: lstm_scan_pallas(w, xp, h0, c0, False)
    q8 = lambda w, xp: lstm_scan_q8(w, xp, h0, c0)

    d1 = bench(fwd_scalar(scan), wb, xp)
    d2 = bench(fwd_scalar(bf16), w, xp)
    d3 = bench(fwd_scalar(q8), w, xp)
    print(f"fwd : scan {d1*1e3:.2f}  resident-bf16 {d2*1e3:.2f} "
          f"({d1/d2:.2f}x)  resident-q8 {d3*1e3:.2f} ms ({d1/d3:.2f}x)",
          flush=True)

    g1 = bench(grad_scalar(scan), wb, xp)
    g2 = bench(grad_scalar(bf16), w, xp)
    g3 = bench(grad_scalar(q8), w, xp)
    print(f"grad: scan {g1*1e3:.2f}  resident-bf16 {g2*1e3:.2f} "
          f"({g1/g2:.2f}x)  resident-q8 {g3*1e3:.2f} ms ({g1/g3:.2f}x)",
          flush=True)


if __name__ == "__main__":
    main()
