"""argparse re-export + shared formatter (reference: ha/argparse.py)."""

from argparse import *  # noqa: F401,F403
import argparse as _argparse


class Formatter(_argparse.ArgumentDefaultsHelpFormatter,
                _argparse.MetavarTypeHelpFormatter):
    """Metavar-from-type help, tolerant of typeless arguments.

    The stock MetavarTypeHelpFormatter crashes `--help` with
    ``AttributeError: 'NoneType' object has no attribute '__name__'``
    on any value-taking argument declared without ``type=`` (and on
    BooleanOptionalAction flags, whose type is None) — fall back to
    the default DEST-based metavar for those.
    """

    def _get_default_metavar_for_optional(self, action):
        if action.type is None:
            return action.dest.upper()
        return super()._get_default_metavar_for_optional(action)

    def _get_default_metavar_for_positional(self, action):
        if action.type is None:
            return action.dest
        return super()._get_default_metavar_for_positional(action)


def int_or_float(value: str):
    """Parse flags that mean 'count' when integral and 'fraction' when
    <= 1.0 (reference ha/argparse.py:14-24)."""
    try:
        return int(value)
    except ValueError:
        return float(value)
