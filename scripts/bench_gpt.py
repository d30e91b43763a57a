"""GPT benchmarks on the current backend: hap-style batch scoring
throughput and single-stream cached generation speed (hat metric).

GPT-2 Small geometry (124M params). Prints results + speed-of-light
context: scoring is MXU-bound (~2*P FLOP/token), generation is
HBM-bound (full weight read per token).
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from haloop_tpu.models import gpt as G


def main():
    cfg = G.GPTConfig(block_size=1024, vocab_size=50304, n_layer=12,
                      n_head=12, n_embd=768)
    params = G.gpt_init(jax.random.PRNGKey(0), cfg)
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if jnp.issubdtype(x.dtype, jnp.floating) else x, params)
    n_params = sum(x.size for x in jax.tree.leaves(params))
    print(f"params: {n_params/1e6:.1f}M", flush=True)

    B, T = 32, 512
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(1, 50000, (B, T)).astype(np.int32))
    tgt = jnp.asarray(rng.integers(1, 50000, (B, T)).astype(np.int32))

    @jax.jit
    def score(params, ids, tgt):
        return G.forward_all(params, cfg, ids, tgt, reduction='none')

    out = score(params, ids, tgt)
    float(jnp.sum(out.astype(jnp.float32)))
    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        out = score(params, ids, tgt)
    float(jnp.sum(out.astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / iters
    toks = B * T / dt
    sents = B / dt
    flops = 2 * n_params * B * T / dt
    print(f"hap scoring: {dt*1000:.2f} ms/batch (B={B},T={T}) -> "
          f"{sents:.1f} sentences/s, {toks/1e3:.0f}k tokens/s, "
          f"~{flops/1e12:.1f} TFLOP/s model-flops", flush=True)

    # generation: B=1 cached single-token steps
    cache = G.init_cache(cfg, 1, dtype=jnp.bfloat16, size=1024)

    @jax.jit
    def gen_step(params, tok, cache):
        logits, cache = G.forward(params, cfg, tok, past=cache)
        return jnp.argmax(logits[:, -1], -1).astype(jnp.int32)[:, None], cache

    tok = jnp.asarray([[50256]], jnp.int32)
    tok, cache = gen_step(params, tok, cache)
    int(tok[0, 0])
    steps = 64
    t0 = time.perf_counter()
    for _ in range(steps):
        tok, cache = gen_step(params, tok, cache)
    int(tok[0, 0])
    dt = (time.perf_counter() - t0) / steps
    bw = 2 * n_params / dt    # bf16 bytes per token
    print(f"hat generate: {dt*1000:.2f} ms/token -> {1/dt:.1f} tokens/s "
          f"(weight-stream ~{bw/1e9:.0f} GB/s)", flush=True)

    # chunked generation (hat --chunk): one lax.scan dispatch per 64
    # tokens amortizes the remote-tunnel call latency
    from haloop_tpu.models.gpt import generate

    @jax.jit
    def gen64(params, ids, key):
        return generate(params, cfg, ids, 64, top_k=1, key=key)

    ids = jnp.asarray([[50256, 318, 262]], jnp.int32)
    toks, alive = gen64(params, ids, jax.random.PRNGKey(0))
    int(toks[0, -1])
    t0 = time.perf_counter()
    reps = 4
    for r in range(reps):
        toks, alive = gen64(params, ids, jax.random.PRNGKey(r))
    int(toks[0, -1])
    dt = (time.perf_counter() - t0) / (reps * 64)
    print(f"hat generate --chunk 64: {dt*1000:.2f} ms/token -> "
          f"{1/dt:.1f} tokens/s", flush=True)


if __name__ == '__main__':
    main()
