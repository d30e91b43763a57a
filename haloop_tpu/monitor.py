"""Activation statistics (reference: ha/monitor.py).

The torch version registers forward hooks; in the functional world
activations are instrumented explicitly: ``activation_stats`` computes
mean/std/near-zero-fraction for named activation arrays, and
``print_activation_stats`` renders the same 'name\\tmean std zfrac'
lines. The hac eval loop feeds it encoder/recognizer intermediate
outputs on the first batch.
"""

import numpy as np


def activation_stats(named_activations):
    """dict name -> array => dict name -> (mean, std, near_zero_frac)."""
    out = {}
    for name, a in named_activations.items():
        a = np.asarray(a, dtype=np.float32)
        out[name] = (float(a.mean()), float(a.std()),
                     float((np.abs(a) < 1e-3).mean()))
    return out


def print_activation_stats(stats):
    for name, (mean, std, zfrac) in stats.items():
        print(f'{name}\t{mean:.3f} {std:.3f} {zfrac:.3f}')
