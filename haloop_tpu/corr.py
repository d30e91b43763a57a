"""hax — dependence statistics (reference behavior: ha/corr.py).

Reads two space-separated columns from stdin and prints their Pearson
correlation coefficient. ``rank_corr`` computes Spearman rank
correlation between two differently-ordered dataframes sharing an index
(used by the active-learning loop to compare query rankings).
"""

import sys

import numpy as np

from haloop_tpu import argparse


def rank_corr(left, right):
    """Spearman rank correlation of two orderings over the same items."""
    left = left.copy()
    right = right.copy()
    left['left_rank'] = np.arange(len(left))
    right['right_rank'] = np.arange(len(right))
    merged = left.merge(right, left_index=True, right_index=True)
    n = len(merged)
    if n < 2:
        return 1.0
    d2 = np.square(merged['left_rank'] - merged['right_rank']).sum()
    return 1.0 - 6.0 * d2 / (n * (n * n - 1))


def pearson(x, y):
    return float(np.corrcoef(x, y)[0, 1])


def main():
    parser = argparse.ArgumentParser(
        description='hax computes dependence statistics',
        formatter_class=argparse.Formatter)
    parser.parse_args()
    table = np.loadtxt(sys.stdin, delimiter=' ')
    print(pearson(table[:, 0], table[:, 1]))


if __name__ == '__main__':
    main()
