"""One-process TPU sweep: LSTM unroll variants + transformer train step.
(Single process so the TPU claim is taken once.)"""

import sys
import time

import numpy as np
import jax

# hac's default dropout PRNG (loop.py --prng): threefry
# costs ~15% of this step and would skew A/Bs vs bench.py
jax.config.update('jax_default_prng_impl', 'rbg')
import jax.numpy as jnp

sys.path.insert(0, ".")


def time_steps(step, n=10):
    float(step(0))
    t0 = time.perf_counter()
    loss = None
    for i in range(n):
        loss = step(i + 1)
    lv = float(loss)
    return (time.perf_counter() - t0) / n, lv


def lstm_bench(unroll):
    import haloop_tpu.nn.lstm as L
    L._UNROLL = unroll
    from haloop_tpu.init import create_model
    from haloop_tpu.loop import System, make_parser
    from haloop_tpu.symbol_tape import make_vocab

    args = make_parser().parse_args(
        ['--arch', 'lstm:512', '--vocab', '512', '--lr', '3e-4'])
    spec = create_model(args.arch)
    params = spec.init(jax.random.PRNGKey(0))
    system = System(args, spec, params, make_vocab('512'))
    B, T, U = 48, 1200, 40
    rng = np.random.default_rng(0)
    inputs = jnp.asarray(rng.normal(size=(B, T, 80)).astype(np.float32))
    targets = jnp.asarray(rng.integers(4, 512, (B, U)).astype(np.int64))
    il = jnp.asarray(np.full(B, T, np.int32))
    tl = jnp.asarray(np.full(B, U, np.int32))

    def step(i):
        out = system._train_step(system.params, system.opt_state, inputs,
                                 targets, il, tl, system.next_key(),
                                 jnp.int32(i))
        system.params, system.opt_state = out[0], out[1]
        return out[2]

    dt, loss = time_steps(step)
    print(f"lstm unroll={unroll}: {dt*1000:.1f} ms/step -> "
          f"{48/dt:.1f} utt/s (loss {loss:.3f})", flush=True)


def transformer_bench():
    from haloop_tpu.init import create_model
    from haloop_tpu.loop import System, make_parser
    from haloop_tpu.symbol_tape import make_vocab

    args = make_parser().parse_args(
        ['--arch', 'e6ctc-d4:512', '--vocab', '512', '--lr', '3e-4'])
    spec = create_model(args.arch)
    params = spec.init(jax.random.PRNGKey(0))
    system = System(args, spec, params, make_vocab('512'))
    B, T, U = 24, 1200, 40
    rng = np.random.default_rng(0)
    inputs = jnp.asarray(rng.normal(size=(B, T, 80)).astype(np.float32))
    targets = jnp.asarray(rng.integers(4, 512, (B, U)).astype(np.int64))
    il = jnp.asarray(np.full(B, T, np.int32))
    tl = jnp.asarray(np.full(B, U, np.int32))

    def step(i):
        out = system._train_step(system.params, system.opt_state, inputs,
                                 targets, il, tl, system.next_key(),
                                 jnp.int32(i))
        system.params, system.opt_state = out[0], out[1]
        return out[2]

    dt, loss = time_steps(step)
    print(f"e6ctc-d4 B={B} T={T}: {dt*1000:.1f} ms/step -> "
          f"{B/dt:.1f} utt/s (loss {loss:.3f})", flush=True)


if __name__ == '__main__':
    for unroll in (1, 8):
        lstm_bench(unroll)
    transformer_bench()
