"""Decompose the hap scoring step (GPT-2 S, 16k tokens) into its parts
to name the binding cost: trunk-only vs CE-only vs full, plus raw
matmul-chain rates at the same shapes (the practical MXU ceiling).

One scalar fetch closes every timing region (see .claude/skills/verify).
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from haloop_tpu.models import gpt as G
from haloop_tpu.models.gpt import _trunk
from haloop_tpu.ops.fused_ce import fused_ce_nll

PEAK = 197.0


def timeit(fn, *args, iters=10):
    out = fn(*args)
    float(jnp.sum(out.astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(out.astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters


def main():
    cfg = G.GPTConfig(block_size=1024, vocab_size=50304, n_layer=12,
                      n_head=12, n_embd=768)
    params = G.gpt_init(jax.random.PRNGKey(0), cfg)
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if jnp.issubdtype(x.dtype, jnp.floating) else x, params)
    rng = np.random.default_rng(0)
    B, T = 16, 1024
    NT = B * T
    ids = jnp.asarray(rng.integers(1, 50000, (B, T)).astype(np.int32))
    tgt = jnp.asarray(rng.integers(1, 50000, (B, T)).astype(np.int32))

    @jax.jit
    def full(params, ids, tgt):
        return G.forward_all(params, cfg, ids, tgt, reduction='none')

    @jax.jit
    def trunk_only(params, ids):
        x, _, _ = _trunk(params, cfg, ids)
        return jnp.sum(x.astype(jnp.float32))

    x_feed = jnp.asarray(rng.normal(size=(NT, 768)).astype(np.float32)
                         ).astype(jnp.bfloat16)

    @jax.jit
    def ce_only(params, x, tgt):
        return fused_ce_nll(x, params["lm_head"]["weight"],
                            tgt.reshape(-1).astype(jnp.int32))

    dt_full = timeit(full, params, ids, tgt)
    dt_trunk = timeit(trunk_only, params, ids)
    dt_ce = timeit(ce_only, params, x_feed, tgt)
    print(f"full step : {dt_full*1e3:6.2f} ms  ({NT/dt_full/1e3:.0f}k tok/s)")
    print(f"trunk only: {dt_trunk*1e3:6.2f} ms")
    print(f"CE only   : {dt_ce*1e3:6.2f} ms "
          f"(2*768*50304*16k = {2*768*50304*NT/1e12:.2f} TFLOP -> "
          f"{2*768*50304*NT/dt_ce/1e12:.0f} TFLOP/s, "
          f"{100*2*768*50304*NT/dt_ce/1e12/PEAK:.0f}%)")

    # trunk matmul flops: qkv 768x2304, proj 768x768, fc 768x3072,
    # proj2 3072x768 per layer = 2*NT*(768*2304+768*768+2*768*3072)
    mm_flops = 2 * NT * (768*2304 + 768*768 + 2*768*3072) * 12
    # attention: causal avg T/2 keys; qk + pv
    att_flops = 2 * 2 * NT * (T // 2) * 768 * 12
    print(f"trunk matmul flops {mm_flops/1e12:.2f}T + attn "
          f"{att_flops/1e12:.2f}T -> trunk rate "
          f"{(mm_flops+att_flops)/dt_trunk/1e12:.0f} TFLOP/s "
          f"({100*(mm_flops+att_flops)/dt_trunk/1e12/PEAK:.0f}%)")

    # raw matmul chain at identical shapes: the achievable ceiling
    w1 = jnp.asarray(rng.normal(size=(768, 2304)).astype(np.float32)
                     ).astype(jnp.bfloat16)
    w2 = jnp.asarray(rng.normal(size=(768, 768)).astype(np.float32)
                     ).astype(jnp.bfloat16)
    w3 = jnp.asarray(rng.normal(size=(768, 3072)).astype(np.float32)
                     ).astype(jnp.bfloat16)
    w4 = jnp.asarray(rng.normal(size=(3072, 768)).astype(np.float32)
                     ).astype(jnp.bfloat16)

    @jax.jit
    def chain(x):
        for _ in range(12):
            y = x @ w1
            x = (y[:, :768] @ w2)
            x = ((x @ w3) @ w4)
        return jnp.sum(x.astype(jnp.float32))

    dt_mm = timeit(chain, x_feed)
    print(f"bare matmul chain (same shapes x12): {dt_mm*1e3:6.2f} ms -> "
          f"{mm_flops/dt_mm/1e12:.0f} TFLOP/s "
          f"({100*mm_flops/dt_mm/1e12/PEAK:.0f}% of peak)")

    # attention alone at the packed shape
    from haloop_tpu.ops.flash import flash_attention
    q = jnp.asarray(rng.normal(size=(B, 12, T, 64)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    kvl = jnp.full((B,), T, jnp.int32)

    @jax.jit
    def att(q):
        return flash_attention(q, q, q, kvl, True, 0)

    dt_att = timeit(att, q)
    print(f"flash causal T=1024 x1 layer: {dt_att*1e3:6.2f} ms "
          f"(x12 = {12*dt_att*1e3:.1f} ms of the trunk)")


if __name__ == '__main__':
    main()
