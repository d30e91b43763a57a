"""Kernel dispatch policy: use the fused Pallas paths on TPU, the
pure-XLA formulations elsewhere (CPU tests run both via interpret-mode
parity tests). HALOOP_KERNELS=0 force-disables, =1 force-enables
(interpret mode off-TPU) — useful for A/B benchmarks."""

import os

import jax


def use_pallas():
    env = os.environ.get("HALOOP_KERNELS")
    if env is not None:
        return env != "0"
    try:
        # single-chip only by default: GSPMD has no partitioning rules
        # for custom kernels, so under a multi-device mesh the XLA
        # formulations (which shard transparently) are the safe path
        # until the kernels are wrapped in shard_map.
        return jax.default_backend() == "tpu" and len(jax.devices()) == 1
    except Exception:
        return False
