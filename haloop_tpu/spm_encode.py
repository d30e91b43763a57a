"""Corpus -> uint16 binarizer (reference: ha/spm_encode.py).

Encodes stdin lines with a sentencepiece model into one flat uint16
stream; ``--block`` pads every line to a fixed block (asserting fit) for
the hala cond objective. Reports real payload bytes (for bits-per-byte
evaluation) on stderr.
"""

import sys

import numpy as np

from haloop_tpu import argparse


def main():
    parser = argparse.ArgumentParser(description='binarize a corpus',
                                     formatter_class=argparse.Formatter)
    parser.add_argument('--model', type=str, required=True)
    parser.add_argument('--block', type=int, default=0,
                        help='pad each line to this many tokens')
    parser.add_argument('output', type=str)
    args = parser.parse_args()

    try:
        import sentencepiece as spm
    except ImportError:
        print("sentencepiece is not installed in this environment",
              file=sys.stderr)
        raise SystemExit(2)

    sp = spm.SentencePieceProcessor(model_file=args.model)
    out = []
    real_bytes = 0
    for line in sys.stdin:
        line = line.strip()
        real_bytes += len(line.encode('utf-8')) + 1
        ids = sp.encode(line)
        if args.block:
            assert len(ids) <= args.block, \
                f'line has {len(ids)} tokens, block is {args.block}'
            ids = ids + [0] * (args.block - len(ids))
        out.extend(ids)

    arr = np.array(out, dtype=np.uint16)
    arr.tofile(args.output)
    print(f'wrote {len(arr)} tokens to {args.output}; '
          f'real bytes: {real_bytes}', file=sys.stderr)


if __name__ == '__main__':
    main()
