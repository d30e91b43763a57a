"""hap sequence-packing benchmark on the current backend (GPT-2 Small).

Compares, at the same device-token budget (16k tokens/batch):
  * unpacked row-per-sentence scoring (r2 operating point, B=32 x T=512)
  * packed rows with segment masks (hap --pack: 16 rows x 1024)
  * packed rows WITHOUT the segment mask (dense causal) — isolates the
    cost of the block-diagonal masking path
and reports effective REAL-token throughput for a short-sentence stream
(the distribution packing exists for).

Methodology: one scalar fetch closes each timing region (axon tunnel —
see .claude/skills/verify).
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from haloop_tpu.models import gpt as G

PEAK_TFLOPS = 197.0          # bf16 MXU peak, TPU v5e


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
    n_params = sum(x.size for x in jax.tree.leaves(params))
    rng = np.random.default_rng(0)

    def report(tag, dt, real_tokens, device_tokens):
        flops = 2 * n_params * device_tokens / dt
        print(f"{tag}: {dt*1e3:.2f} ms/batch, "
              f"{real_tokens/dt/1e3:.0f}k real tok/s "
              f"({device_tokens/dt/1e3:.0f}k device tok/s, "
              f"{flops/1e12:.1f} TFLOP/s = "
              f"{100*flops/1e12/PEAK_TFLOPS:.0f}% of bf16 peak)",
              flush=True)

    @jax.jit
    def score(params, ids, tgt):
        return jnp.sum(G.forward_all(params, cfg, ids, tgt,
                                     reduction='none'), axis=-1)

    @jax.jit
    def score_packed(params, ids, tgt, pos, seg):
        return G.forward_all(params, cfg, ids, tgt, reduction='none',
                             positions=pos, segment_ids=seg)

    @jax.jit
    def score_dense(params, ids, tgt, pos):
        return G.forward_all(params, cfg, ids, tgt, reduction='none',
                             positions=pos)

    # ---- same-budget comparison: 16k device tokens per batch ----
    B, T = 32, 512
    ids = jnp.asarray(rng.integers(1, 50000, (B, T)).astype(np.int32))
    tgt = jnp.asarray(rng.integers(1, 50000, (B, T)).astype(np.int32))
    dt = timeit(score, params, ids, tgt)
    report(f"unpacked B={B} T={T} (full rows)", dt, B * T, B * T)

    R, W = 16, 1024
    idsp = jnp.asarray(rng.integers(1, 50000, (R, W)).astype(np.int32))
    tgtp = jnp.asarray(rng.integers(1, 50000, (R, W)).astype(np.int32))
    # realistic packing: segment lengths ~ U[8, 72) laid end to end
    seg = np.zeros((R, W), np.int32)
    pos = np.zeros((R, W), np.int32)
    for r in range(R):
        fill, s = 0, 1
        while fill < W:
            n = min(int(rng.integers(8, 72)), W - fill)
            seg[r, fill:fill + n] = s
            pos[r, fill:fill + n] = np.arange(n)
            fill += n
            s += 1
    segj = jnp.asarray(seg)
    posj = jnp.asarray(pos)
    dt = timeit(score_packed, params, idsp, tgtp, posj, segj)
    report(f"packed   R={R} W={W} (segment mask)", dt, R * W, R * W)

    dt = timeit(score_dense, params, idsp, tgtp, posj)
    report(f"dense    R={R} W={W} (no seg mask) ", dt, R * W, R * W)

    # ---- short-sentence stream: what packing actually buys ----
    # 512 sentences, lengths U[8, 72) (mean ~40), unsorted. Unpacked
    # pads each to the 64-wide bucket at B=256 rows (budget 16k);
    # packed fits the same real tokens into ~2.5x fewer device tokens.
    # lengths clamped to the bucket width: counting tokens beyond W
    # as "real" would credit throughput for tokens never scored
    Bs, Ws = 256, 64
    lens = rng.integers(8, Ws + 1, 512)
    ids_s = jnp.asarray(rng.integers(1, 50000, (Bs, Ws)).astype(np.int32))
    tgt_s = np.zeros((Bs, Ws), np.int32)
    for i in range(Bs):
        tgt_s[i, :lens[i % len(lens)]] = 1
    tgt_s = jnp.asarray(tgt_s)
    dt = timeit(score, params, ids_s, tgt_s)
    real_b = int(sum(lens[i % len(lens)] for i in range(Bs)))
    report(f"unpacked short-sentence B={Bs} W={Ws}", dt, real_b, Bs * Ws)
    print(f"  (bucket padding: {100*(1-real_b/(Bs*Ws)):.0f}% of device "
          f"tokens are waste; packed rows above carry ~100%)", flush=True)


if __name__ == '__main__':
    main()
