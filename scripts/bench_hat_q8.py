"""hat --q8 A/B: GPT-2 Small single-stream decode (the hat REPL path,
G.generate's lax.scan against the fixed cache), bf16 weights vs
weight-only int8 (quant.py).

Decode at B=1 re-reads every weight per token: GPT-2S is ~124M params
= 248 MB bf16 / 124 MB int8+scales per token. If the int8 bytes are
what crosses HBM (convert fused into the dot), tok/s should approach
2x. Interleaved reps (methodology: PERFORMANCE.md 'repeat a surprising
number')."""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

from haloop_tpu.models import gpt as G
from haloop_tpu.quant import quantize_gpt_params

cfg = G.GPTConfig(block_size=1024, vocab_size=50304, n_layer=12,
                  n_head=12, n_embd=768)
params = G.gpt_init(jax.random.PRNGKey(0), cfg)


def to_bf16(t):
    return jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if jnp.issubdtype(x.dtype, jnp.floating) else x, t)


variants = {
    "bf16": to_bf16(params),
    "q8": to_bf16(quantize_gpt_params(params)),
}

ids = jnp.asarray(np.random.default_rng(0).integers(1, 50257, (1, 32)))
NEW = 128


@jax.jit
def _gen(p, ids):
    # one compiled program: prefill + the 128-step decode scan (the
    # eager path would dispatch the prefill op-by-op through the
    # tunnel and re-trace the scan per call)
    return G.generate(p, cfg, ids, max_new_tokens=NEW, top_k=1)


def run(p):
    toks, _ = _gen(p, ids)
    return np.asarray(toks)         # value fetch = the only real sync


for name, p in variants.items():    # compile + warm
    run(p)

reps = {k: [] for k in variants}
for _ in range(5):
    for name, p in variants.items():
        t0 = time.perf_counter()
        run(p)
        reps[name].append(NEW / (time.perf_counter() - t0))

for name, r in reps.items():
    print(f"{name}: median {np.median(r):.1f} tok/s "
          f"(min {min(r):.1f}, max {max(r):.1f})")
print(f"speedup: {np.median(reps['q8']) / np.median(reps['bf16']):.2f}x")
