"""wandb facade: use the real client when installed, no-op otherwise
(this image ships no wandb; the reference hard-imports it)."""

try:
    import wandb as _wandb

    init = _wandb.init

    def log(*args, **kwargs):
        # dispatch at CALL time: wandb.init() rebinds wandb.log on the
        # module (the import-time binding is a pre-init stub that
        # raises), so a frozen `log = _wandb.log` would break --wandb
        return _wandb.log(*args, **kwargs)

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
