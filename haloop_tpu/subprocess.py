"""Subprocess wrapper used by the active-learning loop
(reference: ha/subprocess.py): tee to a log file, timing, shlex echo,
check=True by default."""

import shlex
import subprocess
import time
from contextlib import ExitStack
from functools import reduce, wraps
from pathlib import Path


@wraps(subprocess.run)
def run(cmd, *args, output_filename: Path | None = None, quiet=False,
        **kwargs):
    with ExitStack() as stack:
        if output_filename:
            kwargs['stdout'] = stack.enter_context(open(output_filename, 'w'))
            kwargs['stderr'] = subprocess.STDOUT

        if isinstance(cmd, str):
            cmd = [cmd]
            kwargs['shell'] = True

        if not quiet:
            if output_filename:
                print(shlex.join(cmd), '>', output_filename, flush=True)
            else:
                print(shlex.join(cmd), flush=True)
        x = cmd[0]
        t0 = time.time()
        if 'check' not in kwargs:
            kwargs['check'] = True
        try:
            return subprocess.run(cmd, *args, **kwargs)
        finally:
            if not quiet:
                print('#', x, 'took', time.time() - t0, flush=True)


def sh(x, *args, **kwargs):
    dash_dash = [[f"--{kw.replace('_', '-')}", str(kwargs[kw])]
                 for kw in kwargs]
    return run([x] + reduce(list.__add__, dash_dash, [])
               + [str(arg) for arg in args])
