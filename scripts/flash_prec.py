import sys
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

    for causal in (False, True):
        gf = jax.jit(jax.grad(lambda q, k, v: jnp.sum(
            flash_attention(q, k, v, kvl, causal, 0) ** 2),
            argnums=(0, 1, 2)))(q, k, v)
        with jax.default_matmul_precision("highest"):
            gx = jax.jit(jax.grad(lambda q, k, v: jnp.sum(
                _reference(q, k, v, kvl, causal, 0) ** 2),
                argnums=(0, 1, 2)))(q, k, v)
        gr = jax.jit(jax.grad(lambda q, k, v: jnp.sum(
            _reference(q, k, v, kvl, causal, 0) ** 2),
            argnums=(0, 1, 2)))(q, k, v)
        d_flash = [float(jnp.abs(a - b).max()) for a, b in zip(gf, gx)]
        d_ref = [float(jnp.abs(a - b).max()) for a, b in zip(gr, gx)]
        mag = [float(jnp.abs(a).max()) for a in gx]
        print(f"causal={causal}")
        print("  |grad| max:", [f"{m:.1f}" for m in mag])
        print("  flash vs exact:", [f"{d:.2e}" for d in d_flash])
        print("  default-ref vs exact:", [f"{d:.2e}" for d in d_ref],
              flush=True)


if __name__ == '__main__':
    main()
