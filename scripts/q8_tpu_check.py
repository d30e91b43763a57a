"""Compiled-mode (non-interpret) ragged-shape parity canary for the
int8-weight decode matmul (ops/q8_matmul.py) on the REAL TPU backend.

Why this exists: the kernel deliberately leaves unaligned weights
unpadded and lets the trailing K/N blocks read out of bounds (padding
the weights in-graph would make XLA hoist a second int8 copy of every
weight into HBM for the whole decode program). Correctness of that
choice rests on Pallas-TPU edge-block read semantics that are NOT a
documented contract (garbage-but-finite data, zero-padded activations
annihilate it) — verified on jax 0.9.0 / TPU v5e. A JAX/Mosaic upgrade
that changes OOB block reads (bounds checks, different padding) would
break exactly the ragged shapes this sweeps, so run this on the chip
after any JAX upgrade (ADVICE r4). The interpret-mode equivalent runs
in CI (tests/test_quant.py::test_q8_matmul_kernel); only the compiled
Mosaic path can catch a real semantics change.

Usage: python scripts/q8_tpu_check.py   (exits non-zero on mismatch)
"""

import sys
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from haloop_tpu.ops.q8_matmul import q8_matmul

# (M, K, N): aligned anchor, ragged K (GPT-2 XL's 1600 pre-padding
# regression shape), ragged N, ragged both, sub-tile tiny, and a
# multi-K-tile ragged shape that exercises the [1024, 2048] bk picker
SHAPES = [
    (1, 768, 2304),
    (1, 1600, 6400),
    (3, 760, 2300),
    (16, 1000, 1000),
    (1, 100, 100),
    (2, 5000, 1234),
]


def main():
    print("backend:", jax.default_backend(), flush=True)
    assert jax.default_backend() != "cpu", \
        "this canary must run the compiled Mosaic path (TPU backend)"
    rng = np.random.default_rng(0)
    worst = 0.0
    for M, K, N in SHAPES:
        x = jnp.asarray(rng.normal(size=(M, K)).astype(np.float32),
                        jnp.bfloat16)
        q = jnp.asarray(rng.integers(-127, 128, (N, K)).astype(np.int8))
        s = jnp.asarray((rng.random(N) * 0.02 + 0.001).astype(np.float32))
        got = np.asarray(jax.jit(q8_matmul)(x, q, s)).astype(np.float32)
        ref = np.asarray(
            jnp.asarray(x, jnp.float32) @ q.astype(jnp.float32).T
            * s[None, :])
        denom = max(np.abs(ref).max(), 1.0)
        err = np.abs(got - ref).max() / denom
        worst = max(worst, err)
        status = "ok" if err < 2e-2 else "FAIL"
        print(f"({M:4d},{K:5d},{N:5d}) rel-err {err:.2e} {status}",
              flush=True)
        if status == "FAIL":
            sys.exit(1)
    print(f"q8 ragged-shape canary passed (worst rel-err {worst:.2e}, "
          f"jax {jax.__version__})")


if __name__ == "__main__":
    main()
