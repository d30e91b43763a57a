"""haw — WER comparison of ref/hyp label files (reference: ha/wer.py —
behavior/format parity: same DataFrame columns, '.+-X' tag alphabet,
TSV to stdout and the %WER summary line to stderr).

Uses the in-repo Levenshtein alignment (haloop_tpu.align, C-accelerated
with a python fallback) instead of kaldialign.
"""

import sys
from pathlib import Path

import pandas as pd

from haloop_tpu import argparse
from haloop_tpu.align import align

GAP = '␣'


def clean_tokens(text):
    return ' '.join(t for t in text.split() if t != GAP)


def clean_and_join_tokens(text):
    return ''.join(t for t in text.split() if t != GAP).replace('▁', ' ')


def read_text(filename: Path):
    """'key TAB text' file -> DataFrame indexed by line number."""
    records = {}
    with open(filename) as f:
        for i, line in enumerate(f):
            key, text = line.strip().split(maxsplit=1)
            records[i] = (key, clean_tokens(text))
    df = pd.DataFrame.from_dict(records, orient='index',
                                columns=['media_filename', 'text'])
    df.index.name = 'dataset_index'
    return df


def compute_alignment(hyp, ref):
    """Per-utterance edit tags: '.' match, 'X' sub, '+' ins, '-' del
    (the reference's tag alphabet, ha/wer.py:28-52; pair order follows
    kaldialign: first element is the ref side)."""
    counts = {'+': 0, '-': 0, 'X': 0, '.': 0}
    tags = []
    for a, b in align(ref, hyp, GAP):
        tag = ('+' if a == GAP else
               '-' if b == GAP else
               '.' if a == b else 'X')
        counts[tag] += 1
        tags.append(tag)
    return {'tags': ''.join(tags), 'ins': counts['+'],
            'del': counts['-'], 'sub': counts['X'],
            'total': counts['+'] + counts['-'] + counts['X'],
            'hyp_length': len(hyp)}


def compute_wer_pointwise(ref_df, hyp_df, join_bpe=False):
    """Join ref/hyp on media_filename and attach per-row alignment
    stats (columns: ref_length, tags, ins, del, sub, total,
    hyp_length)."""
    clean = clean_and_join_tokens if join_bpe else clean_tokens
    wer_df = ref_df.merge(hyp_df, on='media_filename',
                          suffixes=('_ref', '_hyp'))
    rows = []
    for ref_text, hyp_text in zip(wer_df['text_ref'], wer_df['text_hyp']):
        ref_words = clean(ref_text).split()
        stats = compute_alignment(clean(hyp_text).split(), ref_words)
        rows.append({'ref_length': len(ref_words)} | stats)
    return wer_df.join(pd.DataFrame(rows, index=wer_df.index))


def format_wer(wer_df, tag='WER'):
    s = {c: wer_df[c].sum()
         for c in ('total', 'ref_length', 'ins', 'del', 'sub')}
    return (f'%{tag}', round(100 * s['total'] / s['ref_length'], 2),
            f"errors={s['total']}/{s['ref_length']}",
            f"ins={s['ins']}", f"del={s['del']}", f"sub={s['sub']}")


def main():
    parser = argparse.ArgumentParser(description='haw compares word errors',
                                     formatter_class=argparse.Formatter)
    parser.add_argument('-w', '--words', action='store_true',
                        help='Compute WER in words by joining BPE tokens')
    parser.add_argument('ref', type=Path, help='ref')
    parser.add_argument('hyp', type=Path, help='hyp')
    args = parser.parse_args()

    wer_df = compute_wer_pointwise(read_text(args.ref), read_text(args.hyp),
                                   join_bpe=args.words)
    wer_df.to_csv(sys.stdout, sep='\t', index=False)
    print(*format_wer(wer_df), file=sys.stderr)


if __name__ == '__main__':
    main()
