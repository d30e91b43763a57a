"""Interleaved A/B of the fused flat-cache decode kernel vs the XLA
fallback (HALOOP_KERNELS=1 vs =0 at trace time), on the real chip.

GPT-2S bf16, prompt 32 + 128 new tokens — the exact bench.py decode
program — at B = 1, 8, 32, plain and left-padded (the hat --batch
serving shape). Both program variants are compiled first, then timed
interleaved A/B/A/B to defeat the transient-pollution failure mode the
verify notes document. Run on a QUIET chip.

On token parity: the kernel reduces the f32 probs·V contraction on the
VPU (elementwise + sum over S) where XLA's head-split einsum rides the
MXU — last-ULP y differences that flip a greedy argmax at near-tie
logits. With a random-init model (near-uniform logits) a few rows per
batch diverge mid-stream and drift after the flip; per-step values
agree to bf16 tolerance (scripts/decode_attn_tpu_check.py: |dy| < 0.08)
and the caches are bit-exact. The table reports rows-diverged and the
earliest flip position rather than pretending bit-exact streams are
the bar — same stream-parity semantics as flash-vs-naive attention.
"""

import os
import sys
import time
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from haloop_tpu.models import gpt as G

    print("backend:", jax.default_backend(), flush=True)
    cfg = G.GPTConfig(block_size=1024, vocab_size=50304, n_layer=12,
                      n_head=12, n_embd=768)
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if jnp.issubdtype(x.dtype, jnp.floating) else x,
        G.gpt_init(jax.random.PRNGKey(0), cfg))

    T0, NEW, REPS = 32, 128, 5
    rng = np.random.default_rng(0)

    def build(B, padded, kernels):
        ids = jnp.asarray(rng.integers(1, 50257, (B, T0)))
        lens = jnp.full((B,), T0, jnp.int32) if padded else None

        @jax.jit
        def gen(p, ids, lens):
            return G.generate(p, cfg, ids, max_new_tokens=NEW, top_k=1,
                              stop_token=-1, prompt_lengths=lens)

        os.environ["HALOOP_KERNELS"] = kernels
        out = np.asarray(gen(params, ids, lens)[0])  # trace under env
        os.environ.pop("HALOOP_KERNELS", None)

        def timed():
            t0 = time.perf_counter()
            np.asarray(gen(params, ids, lens)[0])
            return time.perf_counter() - t0
        return timed, out

    print(f"# GPT-2S bf16 decode {T0}+{NEW}, interleaved best of {REPS}"
          f" (tok/s aggregate)")
    print(f"{'B':>4} {'pad':>4} {'xla':>9} {'kernel':>9} {'ratio':>7}"
          f"  rows-diverged(first-flip)")
    for B in (1, 8, 32):
        for padded in (False, True):
            if padded and B == 1:
                continue
            off, out_off = build(B, padded, "0")
            on, out_on = build(B, padded, "1")
            diff_rows = [int(np.nonzero(a != b)[0][0])
                         for a, b in zip(out_off, out_on)
                         if (a != b).any()]
            div = (f"{len(diff_rows)}/{B}"
                   + (f" (@{min(diff_rows)})" if diff_rows else ""))
            t_off = min(off() for _ in range(REPS))
            t_on = min(on() for _ in range(REPS))
            # second interleaved pass, keep global best
            t_off = min(t_off, min(off() for _ in range(REPS)))
            t_on = min(t_on, min(on() for _ in range(REPS)))
            print(f"{B:>4} {str(padded)[0]:>4} "
                  f"{B * NEW / t_off:>9.0f} {B * NEW / t_on:>9.0f} "
                  f"{t_off / t_on:>6.2f}x  {div}", flush=True)


if __name__ == "__main__":
    main()
