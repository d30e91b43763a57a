"""Compiled-mode (non-interpret) canary for the fused flat-cache decode
attention kernel on the real TPU backend.

The Mosaic lowering enforces block-shape rules interpret mode does not
(last two block dims 8/128-divisible or equal to the array dims) — a
(1, E) row block over a (B, E) array lowers fine at B = 1 and raises a
ValueError at B = 16. This canary compiles `decode_attend_update` at
B in {1, 8, 16, 32} (with and without left-pad starts) and pins values
against the pure-XLA oracle, so a kernel or JAX change that breaks the
real-chip lowering is caught before bench/serving hits it.

Run manually on a QUIET chip: python scripts/decode_attn_tpu_check.py
"""

import sys
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from haloop_tpu.ops.decode_attn import (decode_attend_update,
                                            decode_attend_update_gridded,
                                            decode_attend_reference)

    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    H, E, S = 12, 768, 160
    worst = 0.0
    for B in (1, 8, 16, 32):
        for use_starts in (False, True):
            q, kn, vn = (jnp.asarray(rng.normal(size=(B, E)),
                                     jnp.bfloat16) for _ in range(3))
            kc, vc = (jnp.asarray(rng.normal(size=(B, S, E)),
                                  jnp.bfloat16) for _ in range(2))
            length = jnp.int32(97)
            starts = (jnp.asarray(rng.integers(0, 64, (B,)), jnp.int32)
                      if use_starts else None)
            y, ko, vo = decode_attend_update(q, kn, vn, kc, vc, length,
                                             starts=starts, n_head=H)
            yr, kr, vr = decode_attend_reference(q, kn, vn, kc, vc,
                                                 length, starts=starts,
                                                 n_head=H)
            err = float(jnp.max(jnp.abs(y.astype(jnp.float32)
                                        - yr.astype(jnp.float32))))
            cache_ok = (bool(jnp.array_equal(ko, kr))
                        and bool(jnp.array_equal(vo, vr)))
            worst = max(worst, err)
            print(f"B={B:3d} starts={use_starts!s:5}  max|dy|={err:.4f}"
                  f"  cache_exact={cache_ok}", flush=True)
            assert err < 0.08, (B, use_starts, err)
            assert cache_ok, (B, use_starts)
    print(f"OK compiled-mode kernel parity, worst |dy| = {worst:.4f}",
          flush=True)

    # gridded (online-softmax) variant: VMEM scratch carried across the
    # sequential S-grid axis — compiled-mode lowering + parity at cache
    # sizes past the single-block budget
    worst_g = 0.0
    for B, S2, block_s in ((1, 4096, 1024), (8, 2048, 512),
                           (32, 1024, 256)):
        for use_starts in (False, True):
            q, kn, vn = (jnp.asarray(rng.normal(size=(B, E)),
                                     jnp.bfloat16) for _ in range(3))
            kc, vc = (jnp.asarray(rng.normal(size=(B, S2, E)),
                                  jnp.bfloat16) for _ in range(2))
            length = jnp.int32(S2 - S2 // 3)
            starts = (jnp.asarray(rng.integers(0, 600, (B,)), jnp.int32)
                      if use_starts else None)
            y, ko, vo = decode_attend_update_gridded(
                q, kn, vn, kc, vc, length, starts=starts, n_head=H,
                block_s=block_s)
            yr, kr, vr = decode_attend_reference(
                q, kn, vn, kc, vc, length, starts=starts, n_head=H)
            err = float(jnp.max(jnp.abs(y.astype(jnp.float32)
                                        - yr.astype(jnp.float32))))
            cache_ok = (bool(jnp.array_equal(ko, kr))
                        and bool(jnp.array_equal(vo, vr)))
            worst_g = max(worst_g, err)
            print(f"gridded B={B:3d} S={S2} sb={block_s} "
                  f"starts={use_starts!s:5}  max|dy|={err:.4f}"
                  f"  cache_exact={cache_ok}", flush=True)
            assert err < 0.08, (B, S2, use_starts, err)
            assert cache_ok, (B, S2, use_starts)
    print(f"OK gridded compiled-mode parity, worst |dy| = {worst_g:.4f}",
          flush=True)


if __name__ == "__main__":
    main()
