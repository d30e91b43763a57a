"""e6ctc-d4 (flagship) train step: Pallas kernels on vs off
(HALOOP_KERNELS + flash dispatch A/B). VERDICT r1 item 6's gate.

Run twice: HALOOP_KERNELS=0 python scripts/bench_e6ctc.py
           HALOOP_KERNELS=1 python scripts/bench_e6ctc.py
"""

import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update('jax_default_prng_impl', 'rbg')  # trainer default

sys.path.insert(0, ".")

from haloop_tpu.init import create_model
from haloop_tpu.loop import System, make_parser
from haloop_tpu.symbol_tape import make_vocab


def main():
    mode = os.environ.get("HALOOP_KERNELS", "default")
    args = make_parser().parse_args(
        ['--arch', 'e6ctc-d4:512', '--vocab', '512'])
    vocab = make_vocab('512')
    spec = create_model(args.arch)
    params = spec.init(jax.random.PRNGKey(0))
    system = System(args, spec, params, vocab, mesh=None)

    B, T, U = 24, 1200, 24
    rng = np.random.default_rng(0)
    inputs = jnp.asarray(rng.normal(size=(B, T, 80)).astype(np.float32))
    ct = jnp.asarray(rng.integers(4, 512, (B, U)).astype(np.int64))
    il = jnp.asarray(np.clip(rng.integers(T // 2, T + 1, B), 1, T)
                     .astype(np.int32))
    tl = jnp.asarray(rng.integers(U // 2, U + 1, B).astype(np.int32))

    def step(i):
        (system.params, system.opt_state, loss, gn, bad) = \
            system._train_step(system.params, system.opt_state, inputs,
                               ct, il, tl, jax.random.PRNGKey(i),
                               jnp.int32(i))
        return loss

    loss = step(0)
    print(f"[{mode}] first step loss {float(loss):.3f}", flush=True)
    iters = 15
    t0 = time.perf_counter()
    for i in range(1, iters + 1):
        loss = step(i)
    float(loss)
    dt = (time.perf_counter() - t0) / iters
    print(f"[{mode}] e6ctc-d4 train: {dt*1000:.1f} ms/step, "
          f"{B/dt:.1f} utt/s", flush=True)


if __name__ == "__main__":
    main()
