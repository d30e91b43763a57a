"""Corpus -> uint16 binarizer (reference: ha/spm_encode.py).

Matches the reference's token stream EXACTLY so bits-per-byte numbers
are comparable across toolkits: ``--block`` mode encodes each line as
``'\\n' + line.strip() + '\\n'`` (document-boundary newline tokens) and
pads to the block; stream mode encodes the whole file INCLUDING
newlines. Without ``--model`` the stream is raw utf-8 bytes (the
byte-fallback route on images without a sentencepiece wheel).
``real bytes`` is the payload byte count used for bpb evaluation.
"""

import sys

import numpy as np

from haloop_tpu import argparse


def main():
    parser = argparse.ArgumentParser(description='binarize a corpus',
                                     formatter_class=argparse.Formatter)
    parser.add_argument('--model', type=str,
                        help='bpe model filename (omit for raw bytes)')
    parser.add_argument('--block', type=int, default=0,
                        help='one document per line, padded up to this '
                             'many tokens')
    parser.add_argument('--repeat', default=1, type=int,
                        help='repeat the output this many times')
    parser.add_argument('input_txt', type=str)
    parser.add_argument('output_bin', type=str)
    args = parser.parse_args()

    sp = None
    if args.model:
        try:
            import sentencepiece as spm
        except ImportError:
            print("sentencepiece is not installed in this environment "
                  "(omit --model for raw bytes)", file=sys.stderr)
            raise SystemExit(2)
        sp = spm.SentencePieceProcessor(model_file=args.model)

    if args.block:
        # document boundaries: every line carries its own leading AND
        # trailing newline token (ha/spm_encode.py:19)
        lines = ['\n' + line.strip() + '\n' for line in open(args.input_txt)]
        byte_lines = [line.encode('utf-8') for line in lines]
        if sp is not None:
            ids_per_line = [sp.encode(line) for line in lines]
            max_len = max(max(map(len, ids_per_line)), args.block)
            ids_per_line = [ids + [0] * (max_len - len(ids))
                            for ids in ids_per_line]
        else:
            max_len = max(max(len(line) for line in byte_lines), args.block)
            ids_per_line = [list(line + b'\0' * (max_len - len(line)))
                            for line in byte_lines]
        # off by one for shifting (ha/spm_encode.py:29)
        real_bytes = sum(len(line) - 1 for line in byte_lines)
        assert max_len == args.block, \
            f"some lines are too long: found max_len={max_len}"
        ids = [t for ids in ids_per_line for t in ids]
    else:
        chars = open(args.input_txt).read()
        data = chars.encode('utf-8')
        ids = sp.encode(chars) if sp is not None else list(data)
        real_bytes = len(data)

    ids = ids * args.repeat
    real_bytes = real_bytes * args.repeat

    arr = np.array(ids, dtype=np.uint16)
    arr.tofile(args.output_bin)
    print("wrote", len(ids), "tokens to", args.output_bin,
          "real bytes", real_bytes)


if __name__ == '__main__':
    main()
