"""Every CLI's --help must exit 0 (regression: the shared
MetavarTypeHelpFormatter crashed on value-taking arguments declared
without type=, and the spm CLIs imported sentencepiece before parsing
args)."""

import os
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent

CLIS = ["loop", "init", "rnnlm", "attention_loop", "score", "repl",
        "wer", "corr", "active_loop", "spm_train", "spm_encode",
        "export"]  # grad_norm is a library module (no CLI, as upstream)


@pytest.mark.parametrize("module", CLIS)
def test_cli_help_exits_zero(module):
    env = dict(os.environ, JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="")
    r = subprocess.run([sys.executable, "-m", f"haloop_tpu.{module}",
                        "--help"], cwd=REPO, env=env,
                       capture_output=True, text=True, timeout=120)
    assert r.returncode == 0, (module, r.stderr[-800:])
    assert "usage" in r.stdout.lower(), (module, r.stdout[:200])
