"""Subprocess helpers for the active-learning orchestrator
(reference behavior: ha/subprocess.py): echo the shlex-joined command,
optionally tee stdout+stderr into a log file, time the run, and default
to check=True.
"""

import shlex
import subprocess as _sp
import time
from functools import reduce, wraps
from pathlib import Path


@wraps(_sp.run)
def run(cmd, *args, output_filename: Path | None = None, quiet=False,
        **kwargs):
    shell = isinstance(cmd, str)
    argv = [cmd] if shell else list(cmd)
    if shell:
        kwargs['shell'] = True
    kwargs.setdefault('check', True)

    log_file = None
    if output_filename is not None:
        log_file = open(output_filename, 'w')
        kwargs['stdout'] = log_file
        kwargs['stderr'] = _sp.STDOUT

    if not quiet:
        shown = shlex.join(argv)
        if output_filename is not None:
            print(shown, '>', output_filename, flush=True)
        else:
            print(shown, flush=True)

    started = time.time()
    try:
        return _sp.run(argv, *args, **kwargs)
    finally:
        if log_file is not None:
            log_file.close()
        if not quiet:
            print('#', argv[0], 'took', time.time() - started, flush=True)


def sh(program, *args, **kwargs):
    """Build '--flag value' pairs from kwargs and run."""
    flags = [[f"--{name.replace('_', '-')}", str(value)]
             for name, value in kwargs.items()]
    argv = [program] + reduce(list.__add__, flags, []) + \
        [str(a) for a in args]
    return run(argv)
