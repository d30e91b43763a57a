"""Batched decode throughput (the hat --batch serving path).

GPT-2S bf16, prompt 32 + 128 new tokens, one jitted prefill+scan
program per batch size. Single-stream decode is weight-stream bound
(~0.25 GB/token-step for 124M bf16 params — PERFORMANCE.md decode
decomposition); batching amortizes that stream over B rows while
per-row KV reads and MXU work grow linearly, so aggregate tok/s should
rise steeply until KV bytes + compute take over.

Two program variants are timed at each B:
  * plain       — equal-length prompts, no prompt_lengths (the bench.py
                  single-stream program, batched)
  * left-padded — the hat --batch serving program (per-row starts mask
                  + per-row positions), same shapes; prices the
                  serving surface's masking overhead

Run on a QUIET chip (no other JAX process): PERFORMANCE.md methodology.
"""

import sys
import time
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from haloop_tpu.models import gpt as G

    cfg = G.GPTConfig(block_size=1024, vocab_size=50304, n_layer=12,
                      n_head=12, n_embd=768)
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if jnp.issubdtype(x.dtype, jnp.floating) else x,
        G.gpt_init(jax.random.PRNGKey(0), cfg))

    T0, NEW, REPS = 32, 128, 3
    rng = np.random.default_rng(0)

    def run(B, padded):
        ids = jnp.asarray(rng.integers(1, 50257, (B, T0)))
        lens = jnp.full((B,), T0, jnp.int32) if padded else None

        @jax.jit
        def gen(p, ids, lens):
            return G.generate(p, cfg, ids, max_new_tokens=NEW, top_k=1,
                              stop_token=-1, prompt_lengths=lens)

        np.asarray(gen(params, ids, lens)[0])        # compile + warmup
        best = float("inf")
        for _ in range(REPS):
            t0 = time.perf_counter()
            np.asarray(gen(params, ids, lens)[0])
            best = min(best, time.perf_counter() - t0)
        return B * NEW / best

    print(f"# GPT-2S bf16 decode, prompt {T0} + {NEW} new, "
          f"best of {REPS} (tok/s aggregate)")
    print(f"{'B':>4} {'plain':>10} {'left-padded':>12} {'pad tax':>8}")
    for B in (1, 4, 8, 16, 32, 64):
        plain = run(B, padded=False)
        padded = run(B, padded=True)
        print(f"{B:>4} {plain:>10.0f} {padded:>12.0f} "
              f"{padded / plain:>7.2f}x", flush=True)


if __name__ == "__main__":
    main()
