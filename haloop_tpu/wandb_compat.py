"""wandb facade: use the real client when installed, no-op otherwise
(this image ships no wandb; the reference hard-imports it)."""

try:
    import wandb as _wandb

    init = _wandb.init
    log = _wandb.log

    def get_run():
        return _wandb.run

    def __getattr__(name):
        # `wandb.run` is live module state upstream; mirror it lazily
        if name == "run":
            return _wandb.run
        raise AttributeError(name)
except ImportError:
    def init(*args, **kwargs):
        return None

    def log(*args, **kwargs):
        return None

    def get_run():
        return None

    run = None
