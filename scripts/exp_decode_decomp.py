"""Decompose GPT-2S single-stream decode time (the hat path).

Quiet-chip r5 baseline: 1627 tok/s bf16 = 0.615 ms/token, vs a
~0.3 ms/token weight-stream roofline (248 MB bf16 / token). Where is
the other half? Variables swept here, each as ONE jitted prefill+scan
program (methodology: .claude/skills/verify — value-fetch timing,
interleaved reps):

  * KV cache size: generate() fills a block_size-wide (1024) cache even
    for a 32+128 generation — every token's attention reads
    2 * 12 layers * (1, 12, S, 64) bf16 = 37.7 MB at S=1024 vs 9.4 MB
    at S=256. If decode is bandwidth-dominated this shows up directly.
  * n_layer at fixed cache: slope = per-layer cost, intercept = fixed
    per-token cost (embed + lm_head matmul + argmax + scan step
    overhead; the backend's measured ~140 us/scan-iteration floor for
    tiny bodies bounds the last term).
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

from haloop_tpu.models import gpt as G

T0, NEW = 32, 128
ids = jnp.asarray(np.random.default_rng(0).integers(1, 50257, (1, T0)))


def to_bf16(t):
    return jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if jnp.issubdtype(x.dtype, jnp.floating) else x, t)


def make_gen(cfg, cache_size):
    def gen(p, ids):
        B = ids.shape[0]
        cache = G.init_cache(cfg, B, dtype=G.param_dtype(p),
                             size=cache_size)
        logits, cache = G.forward(p, cfg, ids, past=cache)
        tok = jnp.argmax(logits[:, -1, :], -1)

        def step(carry, _):
            tok, cache = carry
            logits, cache = G.forward(p, cfg, tok[:, None], past=cache)
            return (jnp.argmax(logits[:, -1, :], -1), cache), tok

        (_, _), toks = jax.lax.scan(step, (tok, cache), None, length=NEW)
        return toks

    return jax.jit(gen)


variants = {}
for L in (12, 6, 3):
    cfg = G.GPTConfig(block_size=1024, vocab_size=50304, n_layer=L,
                      n_head=12, n_embd=768)
    p = to_bf16(G.gpt_init(jax.random.PRNGKey(0), cfg))
    for S in (1024, 256):
        variants[f"L={L:2d} S={S:4d}"] = (make_gen(cfg, S), p)

for name, (fn, p) in variants.items():      # compile + warm
    np.asarray(fn(p, ids))
    print("compiled", name, flush=True)

reps = {k: [] for k in variants}
for _ in range(5):
    for name, (fn, p) in variants.items():
        t0 = time.perf_counter()
        np.asarray(fn(p, ids))
        reps[name].append(time.perf_counter() - t0)

print(f"\n{'variant':14s} {'ms/token':>9s} {'tok/s':>7s}")
for name, r in reps.items():
    ms = np.median(r) / NEW * 1e3
    print(f"{name:14s} {ms:9.3f} {NEW / np.median(r):7.1f}")
