"""hat — GPT REPL (reference: ha/attention.py:328-424).

Interactive prompt with readline history/vi-binding, sentencepiece
tokenization, streaming causal generation (or bidirectional __-mask
infill via forward_context for non-causal models), and tokens/sec
timing on stderr.

TPU-native: generation runs as single-token jitted steps against a
fixed-size KV cache (one compile, then device-speed steps); the infill
path is one jitted forward_context call.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from haloop_tpu import argparse
from haloop_tpu.init import load_model
from haloop_tpu.models import gpt as G


class Tok:
    unk = 50254
    eos = 50256
    mask = 21503


def main():
    parser = argparse.ArgumentParser(description='Attention REPL',
                                     formatter_class=argparse.Formatter)
    parser.add_argument('--device', type=str, default='tpu')
    parser.add_argument('--dtype', type=str, default='bfloat16')
    parser.add_argument('--seed', type=int, default=1337)
    parser.add_argument('--spm', type=str, default=None)
    parser.add_argument('--bytes', action='store_true',
                        help="tokenize as raw bytes (ids 0..255) — for "
                             "byte-level checkpoints, no sentencepiece "
                             "needed (hap --bytes counterpart)")
    parser.add_argument('--steps', type=int, default=10)
    parser.add_argument('--chunk', type=int, default=1,
                        help="tokens generated per device dispatch: 1 "
                             "streams like the reference; larger values "
                             "amortize the per-call latency with one "
                             "lax.scan per chunk (prints chunk-wise)")
    parser.add_argument('--spec', type=int, default=0,
                        help="greedy speculative decoding with K-token "
                             "prompt-lookup drafts (exact greedy "
                             "output, several tokens per model call on "
                             "repetitive text; implies --top-k 1)")
    parser.add_argument('--draft', type=str, default=None,
                        help="checkpoint of a smaller GPT to draft for "
                             "--spec (learned drafts accept more tokens "
                             "per verify call than prompt lookup on "
                             "non-repetitive text; output stays exact "
                             "greedy)")
    parser.add_argument('--q8', action='store_true',
                        help="weight-only int8: the big matmul weights "
                             "(c_attn/c_proj/c_fc/lm_head) live int8 in "
                             "HBM with per-channel scales — a MEMORY "
                             "feature (~2x the model per chip; a Pallas "
                             "kernel keeps decode residency truly int8: "
                             "a 9.8B model that cannot exist bf16 on "
                             "one chip decodes at 65 tok/s) that also "
                             "buys modest decode speed (GPT-2S 1.05x, "
                             "XL 1.14x — PERFORMANCE.md). ~0.3%% per-"
                             "weight rounding; exact bf16 is default")
    parser.add_argument('--batch', type=str, default=None, metavar='FILE',
                        help="non-interactive batched serving: read one "
                             "prompt per line, left-pad, and generate "
                             "ALL completions in ONE jitted "
                             "prefill+scan program (per-row attention "
                             "masks + positions keep each stream "
                             "exactly equal to its solo decode; the "
                             "weight stream amortizes over the batch — "
                             "PERFORMANCE.md batched decode). Prints "
                             "one completion per line; --steps tokens "
                             "each; incompatible with --spec/--chunk")
    parser.add_argument('--top-k', type=int, default=1)
    parser.add_argument('--temperature', type=float, default=1.0)
    parser.add_argument('--histfile', type=str, default='hat-history')
    parser.add_argument('ckpt_path')
    args = parser.parse_args()

    try:
        import gnureadline as readline
    except ImportError:
        import readline
    if not args.bytes:
        if not args.spm:
            raise SystemExit("pass --spm model or --bytes")
        try:
            import sentencepiece as spm
        except ImportError:
            print("Please install sentencepiece (or use --bytes)",
                  file=sys.stderr)
            raise

    # vi editing under BOTH line editors: GNU readline (Linux) wants
    # inputrc syntax and silently ignores the editline string; libedit
    # (macOS stdlib readline) is the reverse (reference uses the
    # libedit form only, ha/attention.py:357-365)
    if args.batch is None:
        if 'libedit' in (getattr(readline, '__doc__', '') or ''):
            readline.parse_and_bind('bind -v')
        else:
            readline.parse_and_bind('set editing-mode vi')
        histfile = args.histfile
        try:
            readline.read_history_file(histfile)
        except (FileNotFoundError, OSError):
            print('Creating history file:', histfile, file=sys.stderr)
            readline.write_history_file(histfile)
        history_len = readline.get_current_history_length()

    spec, params = load_model(args.ckpt_path)
    cfg = spec.config
    print('Loaded model:', cfg, file=sys.stderr)
    if not cfg.causal:
        print('This model is bidirectional: treating __ as mask token',
              file=sys.stderr)

    if args.q8:
        # quantize BEFORE the dtype cast: int8 weights are left alone
        # by the cast, the fp32 qscales become bf16 with the rest
        from haloop_tpu.quant import quantize_gpt_params
        params = quantize_gpt_params(params)

    if args.dtype == 'bfloat16':
        params = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if jnp.issubdtype(x.dtype, jnp.floating) else x, params)

    draft_fn = None
    if args.draft:
        dspec, dparams = load_model(args.draft)
        if args.dtype == 'bfloat16':
            dparams = jax.tree.map(
                lambda x: x.astype(jnp.bfloat16)
                if jnp.issubdtype(x.dtype, jnp.floating) else x, dparams)
        draft_fn = G.make_gpt_draft_fn(dparams, dspec.config,
                                       max(args.spec, 1))
        print('Loaded draft model:', dspec.config, file=sys.stderr)

    if args.bytes:
        class ByteTok:
            def encode(self, s):
                return list(s.encode('utf-8'))

            def decode(self, ids):
                return bytes(i for i in ids if 0 < i < 256).decode(
                    'utf-8', 'replace')

            def id_to_piece(self, t):
                return chr(t) if t < 256 else f'<{t}>'
        sp = ByteTok()
        eos = 0                     # byte models: pad never appears in text
    else:
        sp = spm.SentencePieceProcessor(model_file=args.spm)
        eos = Tok.eos
    key = jax.random.PRNGKey(args.seed)

    if args.batch is not None:
        # batched serving: all prompts decode in ONE jitted
        # prefill+scan program; left-padding + per-row masks/positions
        # keep every stream exactly equal to its solo decode
        # (models/gpt.py generate(prompt_lengths=...))
        if not cfg.causal:
            raise SystemExit("--batch needs a causal model")
        if args.spec or args.chunk > 1:
            raise SystemExit("--batch is one scan program; "
                             "--spec/--chunk do not apply")
        with open(args.batch) as f:
            prompts = [ln.rstrip('\n') for ln in f if ln.strip()]
        if not prompts:
            raise SystemExit(f"--batch {args.batch}: no prompts")
        enc = [[eos] + sp.encode(pr) for pr in prompts]
        width = max(len(e) for e in enc)
        if width + args.steps > cfg.block_size:
            raise SystemExit(
                f"--batch: longest prompt ({width} tokens) + --steps "
                f"{args.steps} exceeds the model's block_size "
                f"{cfg.block_size} (the KV cache caps there)")
        ids = np.full((len(enc), width), eos, np.int32)
        for b, e in enumerate(enc):
            ids[b, width - len(e):] = e
        lens = jnp.asarray([len(e) for e in enc], jnp.int32)

        @jax.jit
        def gen(params, ids, lens, key):
            return G.generate(params, cfg, ids, args.steps,
                              temperature=args.temperature,
                              top_k=args.top_k, stop_token=eos,
                              key=key, prompt_lengths=lens)

        def render(tids):
            # same per-token rendering as the interactive emit() below,
            # so a --batch row prints exactly its REPL stream
            out = []
            for t in tids:
                piece = sp.id_to_piece(int(t))
                if piece.startswith('▁'):
                    out.append(' ')
                    piece = piece[1:]
                out.append(piece)
            return ''.join(out)

        t0 = time.time()
        toks, alive = gen(params, jnp.asarray(ids), lens, key)
        toks, alive = np.asarray(toks), np.asarray(alive)
        t1 = time.time()
        for b in range(len(prompts)):
            print(render(toks[b][:int(alive[b].sum())].tolist()))
        total = int(alive.sum())
        print(f' ({total} tokens across {len(prompts)} streams in '
              f'{t1-t0:.2f}s incl. compile = {total/(t1-t0):.0f} tok/s)',
              file=sys.stderr)
        return

    # jitted single-token step with a fixed-size cache
    @jax.jit
    def prefill(params, ids, cache):
        return G.forward(params, cfg, ids, past=cache)

    @jax.jit
    def step(params, tok, cache):
        return G.forward(params, cfg, tok[:, None], past=cache)

    @jax.jit
    def infill(params, ids):
        x, _ = G.forward_context(params, cfg, ids)
        return jnp.argmax(G.lm_logits(params, x), axis=-1)

    def sample(logits, k):
        logits = logits[:, -1, :].astype(jnp.float32) / args.temperature
        if args.top_k == 1:
            return jnp.argmax(logits, axis=-1)
        kth = jnp.sort(logits, axis=-1)[:, -args.top_k][:, None]
        logits = jnp.where(logits < kth, -jnp.inf, logits)
        return jax.random.categorical(k, logits, axis=-1)

    @jax.jit
    def gen_chunk(params, tok, cache, gen_key, start):
        """args.chunk single-token steps in ONE dispatch (lax.scan):
        the per-call host->device latency amortizes over the chunk.
        Per-token keys are fold_in(gen_key, token_index) — the same
        derivation as the streaming path, so a given --seed samples
        identical text at any --chunk."""
        def body(carry, n):
            tok, cache = carry
            logits, cache = G.forward(params, cfg, tok[:, None],
                                      past=cache)
            nxt = sample(logits, jax.random.fold_in(gen_key, n))
            return (nxt.astype(jnp.int32), cache), nxt
        (tok, cache), toks = jax.lax.scan(
            body, (tok, cache), start + jnp.arange(args.chunk))
        return toks[:, 0], tok, cache          # (chunk,) for B=1

    while True:
        try:
            prompt = input('>- ')
        except EOFError:
            break

        if not cfg.causal:
            start = sp.encode(prompt)
            start = [s if s != Tok.mask else Tok.unk for s in start]
            if not start:
                continue
        else:
            start = [eos] + sp.encode(prompt)

        readline.add_history(prompt)
        x = jnp.asarray(np.array(start, np.int32))[None]
        t0 = time.time()
        i = 0

        if not cfg.causal:
            token_ids = np.asarray(infill(params, x))[0]
            print(sp.decode(token_ids.tolist()))
            i = len(start)
        else:
            def emit(tid):
                piece = sp.id_to_piece(tid)
                if piece.startswith('▁'):
                    print(' ', end='')
                    piece = piece[1:]
                print(piece, end='', flush=True)

            if args.spec > 0:
                toks = G.generate_speculative(
                    params, cfg, x, args.steps, draft_len=args.spec,
                    stop_token=eos, draft_fn=draft_fn)
                i = max(len(toks) - 1, 0)
                for tid in toks:
                    emit(tid)
                print()
                t1 = time.time()
                print(f' ({i+1} tokens in {t1-t0:.2f}s)', file=sys.stderr)
                continue

            # right-sized KV capacity (128-aligned buckets, so a prompt
            # length change rarely recompiles): the chunked path can
            # overshoot --steps by up to a chunk before it notices eos
            cache = G.init_cache(
                cfg, 1,
                dtype=jnp.bfloat16 if args.dtype == 'bfloat16'
                else jnp.float32,
                size=G.cache_len_for(cfg, x.shape[1], args.steps,
                                     extra=max(args.chunk, 1)))
            logits, cache = prefill(params, x, cache)

            # one generation key per prompt; per-token keys are
            # fold_in(gen_key, token_index) in BOTH paths, so --chunk
            # only changes dispatch granularity, never the sampled text
            key, gen_key = jax.random.split(key)
            if args.chunk > 1:
                tok = sample(logits,
                             jax.random.fold_in(gen_key, 0)).astype(jnp.int32)
                done = int(tok[0]) == eos
                if not done:
                    emit(int(tok[0]))
                i = 0                       # report matches streaming mode
                ntok = 1
                while i + 1 < args.steps and not done:
                    toks, tok, cache = gen_chunk(params, tok, cache,
                                                 gen_key, jnp.int32(ntok))
                    ntok += args.chunk
                    for tid in np.asarray(toks).tolist():
                        if tid == eos or i + 1 >= args.steps:
                            done = True
                            break
                        emit(tid)
                        i += 1
            else:
                for i in range(args.steps):
                    tok = sample(logits, jax.random.fold_in(gen_key, i))
                    tid = int(tok[0])
                    if tid == eos:
                        break
                    emit(tid)
                    logits, cache = step(params, tok.astype(jnp.int32),
                                         cache)
            print()

        t1 = time.time()
        print(f' ({i+1} tokens in {t1-t0:.2f}s)', file=sys.stderr)

    readline.append_history_file(
        readline.get_current_history_length() - history_len, histfile)


if __name__ == '__main__':
    main()
