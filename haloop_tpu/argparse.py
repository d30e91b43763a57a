"""argparse re-export + shared formatter (reference: ha/argparse.py)."""

from argparse import *  # noqa: F401,F403
import argparse as _argparse


class Formatter(_argparse.ArgumentDefaultsHelpFormatter,
                _argparse.MetavarTypeHelpFormatter):
    pass


def int_or_float(value: str):
    """Parse flags that mean 'count' when integral and 'fraction' when
    <= 1.0 (reference ha/argparse.py:14-24)."""
    try:
        return int(value)
    except ValueError:
        return float(value)
