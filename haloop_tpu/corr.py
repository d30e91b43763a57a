"""hax — dependence statistics on stdin columns (reference: ha/corr.py)."""

import sys

import numpy as np

from haloop_tpu import argparse


def rank_corr(l, r):
    "spearman rank correlation between two differently ordered dataframes with the same index"
    l = l.copy(); r = r.copy()
    l['left_rank'] = np.arange(len(l))
    r['right_rank'] = np.arange(len(r))
    both = l.merge(r, left_index=True, right_index=True)
    rank_sq_diff = (both['left_rank'] - both['right_rank']) ** 2
    n = len(both)
    return 1 - 6 * rank_sq_diff.sum() / (n * (n ** 2 - 1))


def main():
    parser = argparse.ArgumentParser(
        description='hax computes dependence statistics',
        formatter_class=argparse.Formatter)
    parser.parse_args()

    data = np.loadtxt(sys.stdin, delimiter=' ')
    print(np.corrcoef(data[:, 0], data[:, 1])[0, 1])


if __name__ == '__main__':
    main()
