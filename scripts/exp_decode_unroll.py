"""Second decode-overhead probe: scan unrolling + right-sized cache.

exp_decode_decomp.py measured GPT-2S decode at 0.605 ms/token with a
~0.22 ms/token intercept that doesn't scale with layers, of which only
~0.1 ms is the lm_head weight read — the rest matches the backend's
~140 us/scan-iteration floor. ``lax.scan(unroll=k)`` emits k serial
body copies per loop iteration: the token-to-token data dependence
stays serial (this is NOT speculative decoding), but the per-iteration
loop overhead amortizes k-fold. Sweep unroll at the right-sized cache.
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
cfg = G.GPTConfig(block_size=1024, vocab_size=50304, n_layer=12,
                  n_head=12, n_embd=768)
params = jax.tree.map(
    lambda x: x.astype(jnp.bfloat16)
    if jnp.issubdtype(x.dtype, jnp.floating) else x,
    G.gpt_init(jax.random.PRNGKey(0), cfg))


def make_gen(cache_size, unroll):
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

        (_, _), toks = jax.lax.scan(step, (tok, cache), None,
                                    length=NEW, unroll=unroll)
        return toks

    return jax.jit(gen)


variants = {f"S={s:4d} unroll={u}": make_gen(s, u)
            for s, u in [(256, 1), (256, 2), (256, 4), (256, 8),
                         (1024, 4)]}

for name, fn in variants.items():
    np.asarray(fn(params, ids))
    print("compiled", name, flush=True)

reps = {k: [] for k in variants}
for _ in range(5):
    for name, fn in variants.items():
        t0 = time.perf_counter()
        np.asarray(fn(params, ids))
        reps[name].append(time.perf_counter() - t0)

print(f"\n{'variant':18s} {'ms/token':>9s} {'tok/s':>7s}")
for name, r in reps.items():
    ms = np.median(r) / NEW * 1e3
    print(f"{name:18s} {ms:9.3f} {NEW / np.median(r):7.1f}")
