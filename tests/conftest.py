"""Test configuration.

Tests are CPU-only (SURVEY.md §4: unlike the reference's CUDA-bound
tests, everything here must run anywhere) with 8 virtual devices so
sharding/pjit tests exercise real multi-device code paths.

This image's sitecustomize registers an axon TPU PJRT plugin in every
python process; initializing it serializes on the single TPU claim. We
therefore pin the platform to "cpu" via jax.config BEFORE any backend
initialization — the plugin stays registered but is never initialized.
"""

import os
import sys
from pathlib import Path

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# repo root importable regardless of invocation directory
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def reference_module(name):
    """Import a module from the read-only reference checkout as a numerical
    oracle (skip the test if the reference isn't mounted)."""
    import pytest
    ref = Path("/root/reference")
    if not ref.exists():
        pytest.skip("reference checkout not available")
    if str(ref) not in sys.path:
        sys.path.insert(0, str(ref))
    import importlib
    try:
        return importlib.import_module(name)
    except Exception as e:  # torch missing etc.
        pytest.skip(f"cannot import reference {name}: {e}")


# ------------------------------------------------------------------
# Shared hala-CLI harness for the model-parallel parity tests
# (test_hala_tp / _tpsp / _seqpar / _pipeline): one place to change
# the invocation or the loss log format.

REPO = Path(__file__).resolve().parent.parent


def run_hala(tmp_path, train_bin, *extra):
    import subprocess

    env = dict(os.environ, JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="",
               XLA_FLAGS="--xla_force_host_platform_device_count=8")
    return subprocess.run(
        [sys.executable, "-m", "haloop_tpu.attention_loop",
         "--arch", "gpt-nano:256:64", "--train", str(train_bin),
         "--batch_size", "8", "--block_size", "64",
         "--gradient_accumulation_steps", "2", "--max_iters", "3",
         "--save", "none", "--exp", str(tmp_path / "exp"),
         "--dtype", "float32", "--lr_schedule", "const"] + list(extra),
        env=env, capture_output=True, text=True, timeout=900, cwd=REPO)


def losses(stdout):
    import re

    return [float(m) for m in re.findall(r"iter \d+: loss (\d+\.\d+)",
                                         stdout)]


def val_losses(stdout):
    import re

    return [float(m) for m in re.findall(r"val loss (\d+\.\d+)", stdout)]
