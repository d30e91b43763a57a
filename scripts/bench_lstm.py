"""Dev benchmark: lstm:512 CTC train step timing on the current backend.
Usage: python scripts/bench_lstm.py [float32|bfloat16] [batch] [frames]
"""

import sys
import time

import numpy as np
import jax

# hac's default dropout PRNG (loop.py --prng): threefry
# costs ~15% of this step and would skew A/Bs vs bench.py
jax.config.update('jax_default_prng_impl', 'rbg')
import jax.numpy as jnp

sys.path.insert(0, ".")

from haloop_tpu.init import create_model
from haloop_tpu.loop import System, make_parser
from haloop_tpu.symbol_tape import make_vocab


def main():
    dtype = sys.argv[1] if len(sys.argv) > 1 else "bfloat16"
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 48
    T = int(sys.argv[3]) if len(sys.argv) > 3 else 1200
    U = 40

    args = make_parser().parse_args(
        ['--arch', 'lstm:512', '--vocab', '512', '--lr', '3e-4',
         '--dtype', dtype])
    spec = create_model(args.arch)
    params = spec.init(jax.random.PRNGKey(0))
    system = System(args, spec, params, make_vocab('512'))

    rng = np.random.default_rng(0)
    inputs = jnp.asarray(rng.normal(size=(B, T, 80)).astype(np.float32))
    targets = jnp.asarray(rng.integers(4, 512, size=(B, U)).astype(np.int64))
    il = jnp.asarray(np.full(B, T, np.int32))
    tl = jnp.asarray(np.full(B, U, np.int32))

    def step(i):
        key = system.next_key()
        out = system._train_step(system.params, system.opt_state, inputs,
                                 targets, il, tl, key, jnp.int32(i))
        system.params, system.opt_state = out[0], out[1]
        return out[2]

    t0 = time.perf_counter()
    l0 = float(step(0))
    t1 = time.perf_counter()
    print(f"{dtype} B={B} T={T} compile+first: {t1-t0:.1f}s loss: {l0:.4f}",
          flush=True)
    for trial in range(3):
        t0 = time.perf_counter()
        loss = None
        for i in range(10):
            loss = step(i + 1)
        lv = float(loss)
        t1 = time.perf_counter()
        print(f"{dtype} trial {trial}: {t1-t0:.3f}s -> "
              f"{10*B/(t1-t0):.1f} utt/s loss {lv:.4f}", flush=True)


if __name__ == '__main__':
    main()
