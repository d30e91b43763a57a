"""Bisect generation speed: embedding gather mode clip vs default."""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

import haloop_tpu.nn.core as core
from haloop_tpu.models import gpt as G


def bench(tag):
    cfg = G.GPTConfig(block_size=1024, vocab_size=50304, n_layer=12,
                      n_head=12, n_embd=768)
    params = G.gpt_init(jax.random.PRNGKey(0), cfg)
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if jnp.issubdtype(x.dtype, jnp.floating) else x, params)
    cache = G.init_cache(cfg, 1, dtype=jnp.bfloat16, size=1024)

    @jax.jit
    def gen_step(params, tok, cache):
        logits, cache = G.forward(params, cfg, tok, past=cache)
        return jnp.argmax(logits[:, -1], -1).astype(jnp.int32)[:, None], \
            cache

    tok = jnp.asarray([[50256]], jnp.int32)
    tok, cache = gen_step(params, tok, cache)
    int(tok[0, 0])
    t0 = time.perf_counter()
    for _ in range(64):
        tok, cache = gen_step(params, tok, cache)
    int(tok[0, 0])
    dt = (time.perf_counter() - t0) / 64
    print(f"{tag}: {dt*1000:.2f} ms/token -> {1/dt:.1f} tok/s", flush=True)


def main():
    bench("mode=clip")

    def embedding_default(p, ids):
        return jnp.take(p["weight"], ids, axis=0)
    core.embedding.__code__ = embedding_default.__code__
    # also patch the reference imported in gpt
    G.embedding = embedding_default
    bench("mode=default")


if __name__ == '__main__':
    main()
