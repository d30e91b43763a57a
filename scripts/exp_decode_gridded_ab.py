"""Interleaved A/B: gridded fused decode attention vs the pure-XLA
fallback, at cache sizes past the single-block VMEM budget (where
models/gpt.py dispatches the gridded kernel).

Both sides run the same program shape: a jitted lax.scan of STEPS
single-token attention updates over a persistent (B, S, E) flat cache
carry, closed with one scalar fetch. The XLA side is
decode_attend_reference (dynamic_update_slice + head-split view attend
— exactly gpt._attn's fallback math). Run on a QUIET chip:

    python scripts/exp_decode_gridded_ab.py
"""

import sys
import pathlib
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

STEPS = 64
REPS = 5


def main():
    import jax
    import jax.numpy as jnp
    from haloop_tpu.ops.decode_attn import (decode_attend_update_gridded,
                                            decode_attend_reference,
                                            pick_s_block)

    print("backend:", jax.default_backend(), flush=True)
    H, E = 12, 768

    for B, S in ((1, 4096), (8, 4096), (32, 2048)):
        sb = pick_s_block(S, E, 2)
        rng = np.random.default_rng(0)
        qs, ks, vs = (jnp.asarray(rng.normal(size=(STEPS, B, E)),
                                  jnp.bfloat16) for _ in range(3))
        kc0, vc0 = (jnp.asarray(rng.normal(size=(B, S, E)),
                                jnp.bfloat16) for _ in range(2))
        L0 = jnp.int32(S - STEPS - 1)

        def run(fn):
            def step(carry, inp):
                kc, vc, L = carry
                y, kc, vc = fn(*inp, kc, vc, L)
                return (kc, vc, L + 1), jnp.sum(y.astype(jnp.float32))

            @jax.jit
            def prog(kc, vc):
                (_, _, _), ys = jax.lax.scan(step, (kc, vc, L0),
                                             (qs, ks, vs))
                return jnp.sum(ys)

            return prog

        kern = run(lambda q, k, v, kc, vc, L:
                   decode_attend_update_gridded(q, k, v, kc, vc, L,
                                                n_head=H, block_s=sb))
        xla = run(lambda q, k, v, kc, vc, L:
                  decode_attend_reference(q, k, v, kc, vc, L, n_head=H))

        # warm both, then interleave
        assert np.isfinite(float(kern(kc0, vc0)))
        assert np.isfinite(float(xla(kc0, vc0)))
        tk, tx = [], []
        for _ in range(REPS):
            t0 = time.perf_counter()
            float(kern(kc0, vc0))
            tk.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            float(xla(kc0, vc0))
            tx.append(time.perf_counter() - t0)
        mk, mx = min(tk) / STEPS * 1e3, min(tx) / STEPS * 1e3
        bytes_step = 2 * B * S * E * 2
        print(f"B={B:3d} S={S} sb={sb}: kernel {mk:.3f} ms/step "
              f"({bytes_step / mk / 1e6:.0f} GB/s) vs xla {mx:.3f} "
              f"ms/step ({bytes_step / mx / 1e6:.0f} GB/s) -> "
              f"{mx / mk:.2f}x", flush=True)


if __name__ == "__main__":
    main()
