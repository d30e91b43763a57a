"""Kernel dispatch policy: use the fused Pallas paths on TPU, the
pure-XLA formulations elsewhere (CPU tests run both via interpret-mode
parity tests). HALOOP_KERNELS=0 force-disables, =1 force-enables
(interpret mode off-TPU) — useful for A/B benchmarks."""

import contextlib
import os

import jax

# set while tracing a shard_map body: every shard is one device there,
# so the kernels are safe regardless of the global device count
_LOCAL = False


@contextlib.contextmanager
def force_local():
    """Mark the enclosed trace as per-device (inside shard_map): kernel
    dispatch may ignore the global device count."""
    global _LOCAL
    prev = _LOCAL
    _LOCAL = True
    try:
        yield
    finally:
        _LOCAL = prev


def use_pallas():
    env = os.environ.get("HALOOP_KERNELS")
    if env:                       # empty string == unset, not force-on
        return env != "0"
    try:
        if jax.default_backend() != "tpu":
            return False
        # single-chip by default: GSPMD has no partitioning rules for
        # custom kernels. Multi-device paths that want the kernels run
        # inside shard_map and mark the trace with force_local().
        return _LOCAL or len(jax.devices()) == 1
    except Exception:
        return False
