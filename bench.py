"""Benchmark: hac LSTM-CTC training throughput (utterances/sec) on one
chip — the BASELINE.md headline metric — plus secondary metrics for the
other flagship paths, each printed as its own JSON line BEFORE the
headline so a tail-parse still reads the headline last (VERDICT r3
next-round item 1).

Headline: the full jitted train step of the ``lstm:512`` production
arch (fbank(80) -> Conv1d subsample -> 3x LSTM(1536) -> CTC) on
LibriSpeech-shaped synthetic batches: batch 48, 12s utterances
(1200 frames), ~40 BPE targets.

vs_baseline: ratio against 40 utt/sec — our estimate of single-A100
throughput for this exact config with the reference stack (torch
fp16 + cuDNN LSTM; an A100 runs this model at roughly 1.0-1.2 s/step at
batch 48). The reference publishes no numbers (BASELINE.md), so this
anchor is an engineering estimate, stated here for transparency; the
target from BASELINE.json is >= 5x that anchor (vs_baseline >= 5).

Secondary lines (no baseline anchors exist; "note" marks them):
  * hat GPT-2-Small single-stream decode tok/s (FIRST — the most
    contention-sensitive metric; reads 5-10% low right after a heavy
    bench)
  * hat --batch GPT-2-Small serving decode aggregate tok/s (B=32,
    left-padded rows, fused flat-cache decode attention kernel)
  * e6ctc-d4:512 train utt/s (flagship attention recognizer, B=24)
  * rnn-transducer:lstm:512 train utt/s (B=16)
  * hap GPT-2-Small packed scoring real tokens/s (16 rows x 1024)
"""

import json
import os
import subprocess
import threading
import time

import numpy as np

A100_ESTIMATE_UTT_PER_SEC = 40.0

# generous: first remote compile through the axon tunnel has been
# measured at up to ~550s; a DEAD tunnel relay hangs forever — emit a
# parseable failure line instead of hanging the driver
WATCHDOG_SECONDS = 1500


def other_pythons():
    """Other live python processes: distinguishes 'TPU claimed by a
    concurrent JAX process' from 'tunnel relay dead' in failure notes."""
    try:
        out = subprocess.run(["ps", "-eo", "pid,args"],
                             capture_output=True, text=True).stdout
    except Exception:
        return []
    me = str(os.getpid())
    return [ln.strip() for ln in out.splitlines()[1:]
            if "python" in ln and ln.split()[0] != me
            and "tpu_init" not in ln and "ps -eo" not in ln]


def main():
    done = threading.Event()

    def watchdog():
        if not done.wait(WATCHDOG_SECONDS):
            others = other_pythons()
            if others:
                why = ("another python process is alive and may hold "
                       f"the TPU claim: {others[:3]}")
            else:
                why = ("no other python process found - the tunnel "
                       "relay is likely dead")
            print(json.dumps({
                "metric": "hac lstm:512 CTC train throughput "
                          "(B=48, 12s utts)",
                "value": 0.0,
                "unit": "utt/sec",
                "vs_baseline": 0.0,
                "note": f"TPU backend unreachable within "
                        f"{WATCHDOG_SECONDS}s; no measurement taken; "
                        f"{why}",
            }), flush=True)
            os._exit(3)

    threading.Thread(target=watchdog, daemon=True).start()

    import jax
    import jax.numpy as jnp

    # hac's default: hardware RngBitGenerator for dropout (threefry
    # costs ~15% of this step; loop.py --prng)
    jax.config.update("jax_default_prng_impl", "rbg")

    from haloop_tpu.init import create_model
    from haloop_tpu.loop import System, make_parser
    from haloop_tpu.symbol_tape import make_vocab

    def time_system_step(arch, B, T, U, feat_dim=None, iters=10):
        """utt/s of the full jitted hac train step for one arch.
        Timing closes with ONE scalar fetch (axon tunnel: value fetches
        are the only real sync — .claude/skills/verify)."""
        args = make_parser().parse_args(
            ['--arch', arch, '--vocab', '512', '--lr', '3e-4'])
        spec = create_model(args.arch)
        params = spec.init(jax.random.PRNGKey(0))
        system = System(args, spec, params, make_vocab('512'))
        F = feat_dim if feat_dim is not None else spec.encoder.input_dim
        rng = np.random.default_rng(0)
        inputs = jnp.asarray(rng.normal(size=(B, T, F)).astype(np.float32))
        targets = jnp.asarray(
            rng.integers(4, 512, size=(B, U)).astype(np.int64))
        il = jnp.asarray(np.clip(rng.integers(T // 2, T + 1, B), 1, T)
                         .astype(np.int32))
        tl = jnp.asarray(np.clip(rng.integers(U // 2, U + 1, B), 1, U)
                         .astype(np.int32))

        def step(i):
            key = system.next_key()
            (system.params, system.opt_state, loss, gn, bad) = \
                system._train_step(system.params, system.opt_state,
                                   inputs, targets, il, tl, key,
                                   jnp.int32(i))
            return loss

        float(step(0))                       # warmup + compile
        t0 = time.perf_counter()
        loss = None
        for i in range(1, iters + 1):
            loss = step(i)
        float(loss)
        return B * iters / (time.perf_counter() - t0)

    def secondary(metric, fn, unit):
        try:
            value = fn()
            print(json.dumps({"metric": metric, "value": round(value, 2),
                              "unit": unit, "note": "secondary metric"}),
                  flush=True)
        except Exception as e:               # headline must still print
            print(json.dumps({"metric": metric, "value": 0.0,
                              "unit": unit,
                              "note": f"secondary failed: {e!r:.300}"}),
                  flush=True)

    def hap_packed_tokens_per_sec(iters=10):
        """GPT-2 Small packed scoring (hap --pack device program):
        16 full-width rows x 1024, block-diagonal segment masking,
        ~100% real tokens (PERFORMANCE.md hap roofline)."""
        from haloop_tpu.models import gpt as G
        cfg = G.GPTConfig(block_size=1024, vocab_size=50304, n_layer=12,
                          n_head=12, n_embd=768)
        params = G.gpt_init(jax.random.PRNGKey(0), cfg)
        params = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if jnp.issubdtype(x.dtype, jnp.floating) else x, params)
        R, W = 16, 1024
        rng = np.random.default_rng(0)
        ids = jnp.asarray(rng.integers(1, 50257, (R, W)))
        tgt = jnp.asarray(rng.integers(1, 50257, (R, W)))
        seg = jnp.asarray(np.arange(W) // 64 + 1)[None, :].repeat(R, 0)
        pos = jnp.asarray(np.arange(W) % 64)[None, :].repeat(R, 0)

        @jax.jit
        def score(params, ids, tgt, pos, seg):
            nll = G.forward_all(params, cfg, ids, tgt, reduction='none',
                                positions=pos, segment_ids=seg)
            return jnp.sum(nll)

        float(score(params, ids, tgt, pos, seg))
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = score(params, ids, tgt, pos, seg)
        float(out)
        return R * W * iters / (time.perf_counter() - t0)

    def hat_decode_tokens_per_sec(new=128, B=1):
        """GPT-2 Small decode (hat's path): one jitted prefill +
        lax.scan program per call. B > 1 is the `hat --batch` serving
        shape (left-padded rows; aggregate tok/s) — it rides the fused
        flat-cache decode attention kernel (ops/decode_attn.py)."""
        from haloop_tpu.models import gpt as G
        cfg = G.GPTConfig(block_size=1024, vocab_size=50304, n_layer=12,
                          n_head=12, n_embd=768)
        params = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if jnp.issubdtype(x.dtype, jnp.floating) else x,
            G.gpt_init(jax.random.PRNGKey(0), cfg))
        ids = jnp.asarray(
            np.random.default_rng(0).integers(1, 50257, (B, 32)))
        lens = (jnp.full((B,), 32, jnp.int32) if B > 1 else None)

        @jax.jit
        def gen(p, ids, lens):
            return G.generate(p, cfg, ids, max_new_tokens=new, top_k=1,
                              prompt_lengths=lens)

        np.asarray(gen(params, ids, lens)[0])
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(gen(params, ids, lens)[0])
            best = min(best, time.perf_counter() - t0)
        return B * new / best

    # decode FIRST: it is the most contention-sensitive metric, and a
    # run right after the 5-minute hap bench measurably reads 5-10%
    # low (r5: 1827-1949 in that slot vs 2032 interleaved on a quiet
    # chip — the same pollution window the verify notes document)
    secondary("hat GPT-2S decode (B=1, jitted prefill+scan)",
              hat_decode_tokens_per_sec, "tokens/sec")
    secondary("hat --batch GPT-2S serving decode (B=32, left-padded)",
              lambda: hat_decode_tokens_per_sec(B=32),
              "aggregate tokens/sec")
    secondary("hac e6ctc-d4:512 train throughput (B=24, 12s utts)",
              lambda: time_system_step('e6ctc-d4:512', 24, 1200, 24,
                                       feat_dim=80), "utt/sec")
    secondary("hac rnn-transducer:lstm:512 train throughput (B=16)",
              lambda: time_system_step('rnn-transducer:lstm:512',
                                       16, 1200, 24), "utt/sec")
    secondary("hap GPT-2S packed scoring (16x1024, segment-masked)",
              hap_packed_tokens_per_sec, "real tokens/sec")

    # headline LAST: the driver tail-parses this line
    utt_per_sec = time_system_step('lstm:512', 48, 1200, 40, feat_dim=80)
    done.set()
    print(json.dumps({
        "metric": "hac lstm:512 CTC train throughput (B=48, 12s utts)",
        "value": round(utt_per_sec, 2),
        "unit": "utt/sec",
        "vs_baseline": round(utt_per_sec / A100_ESTIMATE_UTT_PER_SEC, 3),
    }))


if __name__ == '__main__':
    main()
