"""wandb facade: use the real client when installed, no-op otherwise
(this image ships no wandb; the reference hard-imports it)."""

try:
    import wandb as _wandb

    init = _wandb.init
    log = _wandb.log

    @property
    def run():
        return _wandb.run

    def get_run():
        return _wandb.run
except ImportError:
    _run = None

    def init(*args, **kwargs):
        return None

    def log(*args, **kwargs):
        return None

    def get_run():
        return None

    run = None
