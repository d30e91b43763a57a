"""hap — batch sentence scoring with GPT (reference: ha/score.py).

Prints three columns per sentence: NLL/token, token count (after
truncation), token count before truncation. ``--verbose`` adds per-token
pieces via rich.

TPU-native: one jitted ``forward_all(reduction='none')`` per bucketed
(batch, length) shape; sentences are padded to power-of-two-ish length
buckets so token-sorted input (the README throughput recipe) compiles a
handful of programs and then streams at device speed.

Tokenizer: sentencepiece when available (reference behavior); with
``--bytes`` input is tokenized as raw bytes (ids 0..255) for
environments without sentencepiece.
"""

import sys
from itertools import islice

import jax
import jax.numpy as jnp
import numpy as np

from haloop_tpu import argparse
from haloop_tpu.init import load_model
from haloop_tpu.models import gpt as G


def batched(iterable, n):
    if n < 1:
        raise ValueError('n must be at least one')
    it = iter(iterable)
    while batch := tuple(islice(it, n)):
        yield batch


def _bucket(n, minimum=16):
    b = minimum
    while b < n:
        b *= 2
    return b


def pack_by_tokens(token_lists, budget, block_size):
    """Greedy in-order packing: yield consecutive runs of token lists
    whose PADDED size (rows x power-of-two width bucket, capped at
    block_size) stays within ``budget`` tokens.

    Flushes emit a power-of-two row-count prefix and carry the rest
    forward, so row counts come from a log-sized set and the jitted
    scorer compiles O(log B x log W) programs — on unsorted input an
    arbitrary-size flush per width change would compile a fresh program
    for every distinct (rows, width) pair. Only the final tail (and a
    rare over-budget carry) may be ragged."""
    batch, widest = [], 0
    for t in token_lists:
        w = _bucket(max(widest, len(t), 16))
        while batch and (len(batch) + 1) * min(w, block_size) > budget:
            keep = 1 << (len(batch).bit_length() - 1)
            yield batch[:keep]
            batch = batch[keep:]
            widest = max((len(x) for x in batch), default=0)
            w = _bucket(max(widest, len(t), 16))
        batch.append(t)
        widest = max(widest, len(t))
    if batch:
        yield batch


def pack_segments(token_lists, width, rows, bos):
    """Sequence packing (hap --pack): fill ``rows`` rows of exactly
    ``width`` token slots with consecutive sentences laid end-to-end.
    Every slot is a real (or tail-pad) token — padding cost ~0 at ANY
    sentence-length distribution, unlike row-per-sentence batching where
    short sentences pay the bucket width.

    Yields (input_ids, target_ids, positions, segment_ids, metas) with
    metas = [(row, start, n, orig_tokens), ...] in input order. Per
    segment: input [bos, s_0..s_{n-2}], target [s_0..s_{n-1}],
    positions 0..n-1 (absolute positions restart per sentence — same
    numbers each sentence saw unpacked, so NLLs are identical)."""
    inp = np.zeros((rows, width), np.int32)
    tgt = np.zeros((rows, width), np.int32)
    pos = np.zeros((rows, width), np.int32)
    seg = np.zeros((rows, width), np.int32)
    metas = []
    r, fill, nseg = 0, 0, 0

    def flush():
        nonlocal r, fill, nseg, inp, tgt, pos, seg, metas
        out = (inp, tgt, pos, seg, metas)
        inp = np.zeros((rows, width), np.int32)
        tgt = np.zeros((rows, width), np.int32)
        pos = np.zeros((rows, width), np.int32)
        seg = np.zeros((rows, width), np.int32)
        metas = []
        r, fill, nseg = 0, 0, 0
        return out

    for toks in token_lists:
        t = toks[:width]
        n = len(t)
        if n == 0:
            t, n = [bos], 1       # empty line: still emit a row of output
        if fill + n > width:
            r, fill = r + 1, 0
            if r == rows:
                yield flush()
        nseg += 1
        sl = slice(fill, fill + n)
        inp[r, sl] = [bos] + list(t[:-1])
        tgt[r, sl] = t
        pos[r, sl] = np.arange(n)
        seg[r, sl] = nseg
        metas.append((r, fill, n, toks))
        fill += n
    if metas:
        yield flush()


class Tok:
    eos = 50256


def make_tokenizer(args):
    if args.spm:
        try:
            import sentencepiece as spm
        except ImportError:
            print("sentencepiece is not installed; use --bytes",
                  file=sys.stderr)
            raise
        sp = spm.SentencePieceProcessor(model_file=args.spm)
        return lambda lines: sp.encode([p.strip() for p in lines]), \
            sp.id_to_piece
    if args.bytes:
        return (lambda lines: [list(p.strip().encode('utf-8'))
                               for p in lines],
                lambda t: chr(t) if t < 128 else f'<{t}>')
    raise SystemExit("pass --spm model or --bytes")


def main():
    parser = argparse.ArgumentParser(
        description='Score sentences with GPT. Prints three columns: '
                    'negative log likelihood per token, number of tokens '
                    'and total number of tokens before truncation.',
        formatter_class=argparse.Formatter)
    parser.add_argument('--device', type=str, default='tpu')
    parser.add_argument('--dtype', type=str, default='bfloat16')
    parser.add_argument('--compile', action='store_true',
                        help='(jit is always on; kept for parity)')
    parser.add_argument('--verbose', action='store_true')
    parser.add_argument('--seed', type=int, default=1337)
    parser.add_argument('--spm', type=str)
    parser.add_argument('--bytes', action='store_true',
                        help='tokenize input as raw bytes (no spm needed)')
    parser.add_argument('--batch-size', type=int, default=32)
    parser.add_argument('--tokens-per-batch', type=int, default=16384,
                        help="pack rows until padded batch reaches this "
                             "many tokens (keeps the MXU fed when "
                             "sentences are short; 0 = fixed "
                             "--batch-size rows like the reference)")
    parser.add_argument('--pack', default=True,
                        action=argparse.BooleanOptionalAction,
                        help="sequence packing: lay sentences end-to-end "
                             "in full-width rows with block-diagonal "
                             "attention and per-segment positions — "
                             "padding cost ~0 at any length "
                             "distribution; --no-pack falls back to "
                             "row-per-sentence batching")
    parser.add_argument('--q8', action='store_true',
                        help="weight-only int8 matmul weights with "
                             "per-channel scales (quant.py; NLLs shift "
                             "by the quantization error — exact bf16 "
                             "stays the default). Note: scoring "
                             "throughput is fused-CE-kernel-bound, so "
                             "--q8 pays off for MEMORY (a 2x bigger "
                             "model per chip), not speed; the fused "
                             "kernel needs fp weights and falls back")
    parser.add_argument('ckpt_path')
    args = parser.parse_args()

    spec, params = load_model(args.ckpt_path)
    cfg = spec.config
    assert cfg.causal
    encode, id_to_piece = make_tokenizer(args)

    if args.q8:
        from haloop_tpu.quant import quantize_gpt_params
        params = quantize_gpt_params(params)

    if args.dtype == 'bfloat16':
        params = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if jnp.issubdtype(x.dtype, jnp.floating) else x, params)

    @jax.jit
    def score(params, input_ids, target_ids):
        nll = G.forward_all(params, cfg, input_ids, target_ids,
                            reduction='none')
        if args.verbose:
            return nll                           # (B, W) per-token
        return jnp.sum(nll, axis=-1)             # (B,) device-side reduce

    @jax.jit
    def score_packed(params, input_ids, target_ids, positions, segment_ids):
        return G.forward_all(params, cfg, input_ids, target_ids,
                             reduction='none', positions=positions,
                             segment_ids=segment_ids)   # (rows, W)

    def emit(result, completion_tokens):
        nll = np.asarray(result)
        for n, tokens in enumerate(completion_tokens):
            num_tokens = min(cfg.block_size, len(tokens))
            if args.verbose:
                from rich import print as print_
                sentence_nll = nll[n]
                print_(f'{sentence_nll.sum() / num_tokens:0.3f}',
                       num_tokens,
                       ' '.join(f'{id_to_piece(t)} [dim]{l:.02f}[/dim]'
                                for t, l in zip(tokens,
                                                sentence_nll.tolist())),
                       sep='\t', flush=True)
            else:
                print(f'{float(nll[n]) / num_tokens:0.3f}', num_tokens,
                      len(tokens), sep='\t')

    def token_batches(stream):
        """Yield lists of token lists. With --tokens-per-batch, rows
        pack greedily (in input order) until the PADDED batch would
        exceed the budget — short sentences score at large B, long
        ones at small B, and the MXU stays fed either way."""
        if args.tokens_per_batch <= 0:
            for lines in batched(stream, args.batch_size):
                yield encode(lines)
            return
        for lines in batched(stream, 1024):     # tokenize in big chunks
            yield from pack_by_tokens(encode(lines),
                                      args.tokens_per_batch,
                                      cfg.block_size)

    # pipeline depth 2: dispatch batch k+1/k+2 before fetching batch k,
    # hiding host tokenization/padding and device->host latency behind
    # device compute (the reference leans on DataLoader workers for
    # this, ha/loop.py:502-509; here jax's async dispatch suffices)
    from collections import deque

    if args.pack:
        W = cfg.block_size
        rows = (max(1, args.tokens_per_batch // W)
                if args.tokens_per_batch > 0 else args.batch_size)
        bos = Tok.eos if cfg.vocab_size > Tok.eos else 0

        def emit_packed(result, metas):
            nll = np.asarray(result)
            for r, start, n, toks in metas:
                seg_nll = nll[r, start:start + n]
                if args.verbose:
                    from rich import print as print_
                    print_(f'{seg_nll.sum() / n:0.3f}', n,
                           ' '.join(f'{id_to_piece(t)} [dim]{l:.02f}[/dim]'
                                    for t, l in zip(toks,
                                                    seg_nll.tolist())),
                           sep='\t', flush=True)
                else:
                    print(f'{float(seg_nll.sum()) / n:0.3f}', n,
                          len(toks), sep='\t')

        def all_tokens(stream):
            for lines in batched(stream, 1024):
                yield from encode(lines)

        pending = deque()
        for inp, tgt, pos, seg, metas in pack_segments(
                all_tokens(sys.stdin), W, rows, bos):
            pending.append((score_packed(
                params, jnp.asarray(inp), jnp.asarray(tgt),
                jnp.asarray(pos), jnp.asarray(seg)), metas))
            while len(pending) > 2:
                emit_packed(*pending.popleft())
        while pending:
            emit_packed(*pending.popleft())
        sys.stdout.flush()
        return

    pending = deque()

    for i, completion_tokens in enumerate(token_batches(sys.stdin)):
        widest = max(len(p) for p in completion_tokens)
        if widest >= cfg.block_size:
            print(f'warning: batch {i} is too wide ({widest}) and will be '
                  f'truncated', file=sys.stderr)
        W = min(_bucket(widest), cfg.block_size)

        B = len(completion_tokens)
        completions = np.zeros((B, W), np.int32)
        for n, toks in enumerate(completion_tokens):
            t = toks[:W]
            completions[n, :len(t)] = t

        bos = Tok.eos if cfg.vocab_size > Tok.eos else 0
        input_ids = np.concatenate(
            [np.full((B, 1), bos, np.int32), completions[:, :-1]],
            axis=1)

        pending.append((score(params, jnp.asarray(input_ids),
                              jnp.asarray(completions)),
                        completion_tokens))
        while len(pending) > 2:
            emit(*pending.popleft())
    while pending:
        emit(*pending.popleft())
    sys.stdout.flush()


if __name__ == '__main__':
    main()
