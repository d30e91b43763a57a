"""Sentencepiece BPE trainer (reference: ha/spm_train.py). Requires the
optional sentencepiece package."""

import sys

from haloop_tpu import argparse


def main():
    parser = argparse.ArgumentParser(description='train a BPE model',
                                     formatter_class=argparse.Formatter)
    parser.add_argument('--vocab-size', type=int, default=512)
    parser.add_argument('--model-prefix', type=str, default='spm')
    parser.add_argument('input', type=str)
    args = parser.parse_args()

    try:
        import sentencepiece as spm
    except ImportError:
        print("sentencepiece is not installed in this environment",
              file=sys.stderr)
        raise SystemExit(2)

    spm.SentencePieceTrainer.train(
        input=args.input,
        model_prefix=args.model_prefix,
        vocab_size=args.vocab_size,
        model_type='bpe',
        byte_fallback=True,
        normalization_rule_name='nfkc',
        split_digits=True,
    )


if __name__ == '__main__':
    main()
