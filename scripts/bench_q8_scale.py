"""--q8 across model scale: where the int8 kernel starts paying.

r5 quiet-chip capture (right-sized KV caches): GPT-2S 1.02x,
XL-class 1.14x, 9.8B q8-only at 64.8 tok/s. The per-call kernel
overhead is fixed while the byte saving grows with scale, and past
the chip's bf16 capacity --q8 is the only way the model exists at
all. NOTE: this bench generates only 32 tokens from an 8-token
prompt, so prefill + per-program dispatch are amortized over few
tokens — absolutes are lower than the steady-state decode numbers
in PERFORMANCE.md; the bf16/q8 ratios are the comparable part.

Weights are synthesized ON DEVICE (jitted randint/normal per leaf) —
nothing multi-GB crosses the host tunnel; timing is a jitted
prefill+decode-scan program closed with one value fetch.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

from haloop_tpu.models import gpt as G
from haloop_tpu.nn.core import layer_norm_init

CONFIGS = {
    # name: (cfg, try_bf16)
    "gpt2-s 124M": (G.GPTConfig(block_size=1024, vocab_size=50304,
                                n_layer=12, n_head=12, n_embd=768), True),
    "xl-class 1.4B": (G.GPTConfig(block_size=1024, vocab_size=50304,
                                  n_layer=40, n_head=25, n_embd=1600),
                      True),
    # ~9.8B params: 19.6 GB bf16 > the chip's HBM — int8-only by
    # construction (bf16 is not attempted: provoking a real OOM can
    # wedge the tunneled TPU claim, .claude/skills/verify)
    "q8-only 9.8B": (G.GPTConfig(block_size=1024, vocab_size=50304,
                                 n_layer=48, n_head=32, n_embd=4096),
                     False),
}


def _lin_q8(key, n, k):
    kw, ks = jax.random.split(key)
    return {"weight": jax.random.randint(kw, (n, k), -127, 128, jnp.int8),
            "qscale": (jax.random.uniform(ks, (n,), jnp.float32)
                       * 1e-4 + 1e-4).astype(jnp.bfloat16)}


def _lin_bf16(key, n, k):
    return {"weight": jax.random.normal(key, (n, k), jnp.bfloat16) * 0.02}


def make_params(cfg, quantized):
    lin = _lin_q8 if quantized else _lin_bf16
    E = cfg.n_embd

    @jax.jit
    def block(key):
        ks = jax.random.split(key, 4)
        return {
            "ln_1": layer_norm_init(E, bias=False),
            "attn": {"c_attn": lin(ks[0], 3 * E, E),
                     "c_proj": lin(ks[1], E, E)},
            "ln_2": layer_norm_init(E, bias=False),
            "mlp": {"c_fc": lin(ks[2], 4 * E, E),
                    "c_proj": lin(ks[3], E, 4 * E)},
        }

    key = jax.random.PRNGKey(0)
    keys = jax.random.split(key, cfg.n_layer + 1)
    p = {
        "transformer": {
            "wpe": {"weight": jnp.zeros((cfg.block_size, E),
                                        jnp.bfloat16)},
            "h": [block(keys[i]) for i in range(cfg.n_layer)],
            "ln_f": layer_norm_init(E, bias=False),
        },
        "lm_head": jax.jit(lambda k: lin(k, cfg.vocab_size, E))(keys[-1]),
    }
    return p


def weight_gb(p):
    return sum(x.size * x.dtype.itemsize
               for x in jax.tree.leaves(p)) / 2 ** 30


def bf16_gb(cfg):
    """Analytic bf16 weight bytes — no device allocation needed just
    to print why a config is q8-only."""
    E, L, V = cfg.n_embd, cfg.n_layer, cfg.vocab_size
    per_block = 12 * E * E + 6 * E          # 4 matmuls + 2 biasless LN
    return 2 * (L * per_block + V * E + cfg.block_size * E + E) / 2 ** 30


NEW = 32


def measure(cfg, p):
    ids = jnp.asarray(np.random.default_rng(0).integers(1, 50257, (1, 8)))

    @jax.jit
    def gen(p, ids):
        return G.generate(p, cfg, ids, max_new_tokens=NEW, top_k=1)

    np.asarray(gen(p, ids)[0])            # compile + warm
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(gen(p, ids)[0])
        best = min(best, (time.perf_counter() - t0) / NEW)
    return 1.0 / best


for name, (cfg, try_bf16) in CONFIGS.items():
    res = {}
    for tag, quantized in (("bf16", False), ("q8", True)):
        if not quantized and not try_bf16:
            print(f"{name} bf16: not attempted "
                  f"(~{bf16_gb(cfg):.1f} GB bf16-equivalent > HBM)",
                  flush=True)
            continue
        p = make_params(cfg, quantized)
        gb = weight_gb(p)
        toks = measure(cfg, p)
        res[tag] = toks
        print(f"{name} {tag}: {toks:.1f} tok/s ({gb:.2f} GB weights)",
              flush=True)
        del p
    if len(res) == 2:
        print(f"{name} speedup: {res['q8'] / res['bf16']:.2f}x",
              flush=True)
