"""Decompose the hala (GPT-2 Small) train step on the current backend:
forward, forward+backward, CE fwd/bwd isolated (incl. a chunked-bwd
variant that never materializes the full (N, V) dlogits), flash
attention fwd+bwd vs the XLA materialized path, and full-step batch
scaling — to find what binds the step beyond the measured 46% MFU
(PERFORMANCE.md "hala" section).

Timing per the axon-tunnel rules (PERFORMANCE.md): every region closes
with ONE scalar fetch; grads are reduced to a single scalar INSIDE jit.
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
import optax

sys.path.insert(0, ".")

from haloop_tpu.models import gpt as G
from haloop_tpu.optim import decay_mask


def timeit(fn, *args, iters=10, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.tree.map(lambda x: x.block_until_ready(), out)
    # value fetch is the only real sync on this backend
    float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters


def main():
    cfg = G.GPTConfig(block_size=1024, vocab_size=50304, n_layer=12,
                      n_head=12, n_embd=768, dropout=0.0)
    params32 = G.gpt_init(jax.random.PRNGKey(0), cfg)
    n_params = sum(x.size for x in jax.tree.leaves(params32))
    print(f"params: {n_params/1e6:.1f}M backend={jax.default_backend()}",
          flush=True)

    def cast(t):
        return jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if jnp.issubdtype(x.dtype, jnp.floating) else x, t)

    tx = optax.adamw(3e-4, b1=0.9, b2=0.95, weight_decay=0.1,
                     mask=decay_mask)
    opt_state = tx.init(params32)

    def loss_fn(params, x, y, key):
        return G.forward_all(cast(params), cfg, x, y, key=key, train=False)

    def grad_scalar(params, x, y, key):
        loss, g = jax.value_and_grad(loss_fn)(params, x, y, key)
        gn = jnp.sqrt(sum(jnp.sum(jnp.square(l.astype(jnp.float32)))
                          for l in jax.tree.leaves(g)))
        return loss + gn  # one scalar closes the whole bwd

    def full_step(params, opt_state, x, y, key):
        loss, g = jax.value_and_grad(loss_fn)(params, x, y, key)
        gn = jnp.sqrt(sum(jnp.sum(jnp.square(l.astype(jnp.float32)))
                          for l in jax.tree.leaves(g)))
        scale = jnp.minimum(1.0, 1.0 / (gn + 1e-6))
        g = jax.tree.map(lambda l: l * scale, g)
        updates, opt_state = tx.update(g, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    jit_loss = jax.jit(loss_fn)
    jit_grad = jax.jit(grad_scalar)
    jit_step = jax.jit(full_step, donate_argnums=(0, 1))

    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)

    for B in (8, 16):
        T = cfg.block_size
        x = jnp.asarray(rng.integers(1, 50000, (B, T)).astype(np.int32))
        y = jnp.asarray(rng.integers(1, 50000, (B, T)).astype(np.int32))
        try:
            dt_f = timeit(jit_loss, params32, x, y, key)
            dt_g = timeit(jit_grad, params32, x, y, key)
            # full step donates; rebuild state each timing run
            p, s = jax.tree.map(jnp.copy, params32), tx.init(params32)
            for _ in range(3):
                p, s, _ = jit_step(p, s, x, y, key)
            float(jnp.sum(jax.tree.leaves(p)[0].astype(jnp.float32)))
            t0 = time.perf_counter()
            iters = 10
            for _ in range(iters):
                p, s, _ = jit_step(p, s, x, y, key)
            float(jnp.sum(jax.tree.leaves(p)[0].astype(jnp.float32)))
            dt_s = (time.perf_counter() - t0) / iters
        except Exception as e:
            print(f"B={B}: OOM/fail: {type(e).__name__} {str(e)[:200]}")
            continue
        toks = B * T
        mflops = 6 * n_params * toks
        print(f"B={B}: fwd {dt_f*1e3:.1f} ms | fwd+bwd {dt_g*1e3:.1f} ms "
              f"| full step {dt_s*1e3:.1f} ms -> {toks/dt_s/1e3:.0f}k tok/s, "
              f"{mflops/dt_s/1e12:.0f} TFLOP/s model-flops", flush=True)

    # ---- CE isolated: N=8192 tokens, D=768, V=50304
    from haloop_tpu.ops.fused_ce import fused_ce_nll
    N, D, V = 8192, 768, 50304
    xe = jnp.asarray(rng.standard_normal((N, D)).astype(np.float32) * 0.02,
                     jnp.bfloat16)
    we = jnp.asarray(rng.standard_normal((V, D)).astype(np.float32) * 0.02,
                     jnp.bfloat16)
    te = jnp.asarray(rng.integers(1, 50000, (N,)).astype(np.int32))

    jit_ce_f = jax.jit(lambda x, w, t: jnp.sum(fused_ce_nll(x, w, t)))

    def ce_gsum(f):
        def run(x, w, t):
            l, (gx, gw) = jax.value_and_grad(f, argnums=(0, 1))(x, w, t)
            return l + jnp.sum(jnp.square(gx.astype(jnp.float32))) + \
                jnp.sum(jnp.square(gw.astype(jnp.float32)))
        return jax.jit(run)

    jit_ce_g = ce_gsum(lambda x, w, t: jnp.sum(fused_ce_nll(x, w, t)))

    def chunked_ce(x, w, t, k=8):
        xs = x.reshape(k, N // k, D)
        ts = t.reshape(k, N // k)
        losses = jax.lax.map(
            lambda ab: jnp.sum(fused_ce_nll(ab[0], w, ab[1])), (xs, ts))
        return jnp.sum(losses)

    jit_ce_gc = ce_gsum(chunked_ce)

    dt = timeit(jit_ce_f, xe, we, te)
    print(f"CE fwd (fused, N=8k V=50k): {dt*1e3:.2f} ms", flush=True)
    dt = timeit(jit_ce_g, xe, we, te)
    print(f"CE fwd+bwd (materialized dlogits): {dt*1e3:.2f} ms", flush=True)
    dt = timeit(jit_ce_gc, xe, we, te)
    print(f"CE fwd+bwd (chunked k=8, no full dlogits): {dt*1e3:.2f} ms",
          flush=True)

    # ---- attention fwd+bwd: flash kernel vs materialized XLA
    from haloop_tpu.ops.attention import mha
    B, H, T, d = 8, 12, 1024, 64
    q = jnp.asarray(rng.standard_normal((B, H, T, d)).astype(np.float32),
                    jnp.bfloat16)
    k_ = jnp.asarray(rng.standard_normal((B, H, T, d)).astype(np.float32),
                     jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, H, T, d)).astype(np.float32),
                    jnp.bfloat16)

    def att_loss(use_flash):
        def f(q, k, v):
            out, _ = mha(q, k, v, causal=True, use_flash=use_flash)
            return jnp.sum(out.astype(jnp.float32))
        def run(q, k, v):
            l, gs = jax.value_and_grad(f, argnums=(0, 1, 2))(q, k, v)
            return l + sum(jnp.sum(jnp.square(g.astype(jnp.float32)))
                           for g in gs)
        return jax.jit(run)

    for name, mode in (("flash", "auto"), ("xla", "never")):
        dt = timeit(att_loss(mode), q, k_, v)
        print(f"attention fwd+bwd ({name}, B{B} H{H} T{T}): "
              f"{dt*1e3:.2f} ms", flush=True)


if __name__ == '__main__':
    main()
