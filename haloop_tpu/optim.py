"""LR schedules and AdamW with the reference's decay partition
(reference: ha/optim.py).

TPU-native: the optimizer is optax (XLA fuses the update into the train
step — the equivalent of torch's fused AdamW, ha/optim.py:136-139); the
schedule is a pure function usable both from Python and inside jit.

Decay partition parity (ha/optim.py:83-120):
  * Linear/Conv weights decay; biases don't
  * LayerNorm and embedding weights don't decay
  * LSTM weights AND biases decay (reference quirk, preserved)
  * tied lm_head/wte is excluded from decay

Note: the reference lists 'noam' in get_lr but omits it from the CLI
choices (unreachable; SURVEY.md §7 quirk). We expose it.
"""


import jax
import jax.numpy as jnp
import optax

from haloop_tpu.argparse import int_or_float


class LR:
    """Schedule controller with the hac/hala flag surface."""

    def __init__(self, args):
        self.args = args

    @classmethod
    def add_arguments(cls, parser):
        parser.add_argument('--lr', type=float, default=3e-4,
                            help='AdamW learning rate')
        parser.add_argument('--lr_schedule', type=str,
                            choices=['const', 'cosine', 'linear', 'noam'],
                            default='cosine', help='Learning rate schedule')
        parser.add_argument('--warmup_iters', type=int_or_float,
                            default=2000,
                            help='Number or fraction of warm-up steps')
        parser.add_argument('--lr_decay_iters', type=int_or_float,
                            default=200000,
                            help='Number or fraction (<= 1.0) of steps for '
                                 'learning rate decay')
        parser.add_argument('--min_lr', type=float, default=6e-5,
                            help='Minimum learning rate')
        parser.add_argument('--weight_decay', type=float, default=0.01,
                            help='Weight decay')
        parser.add_argument('--beta1', type=float, default=0.9,
                            help='Decay factor for first gradient moment')
        parser.add_argument('--beta2', type=float, default=0.99,
                            help='Decay factor for second gradient moment')

    def _resolve(self, value, total_steps):
        value = float(value)
        return int(total_steps * value) if value <= 1.0 else int(value)

    def get_lr(self, it, total_steps=200000):
        args = self.args
        warmup = self._resolve(args.warmup_iters, total_steps)
        decay_iters = self._resolve(args.lr_decay_iters, total_steps)
        return float(schedule_value(
            it, kind=args.lr_schedule, lr=args.lr, min_lr=args.min_lr,
            warmup_iters=warmup, lr_decay_iters=decay_iters))

    def schedule_fn(self, total_steps=200000):
        """jit-compatible step -> lr function."""
        args = self.args
        warmup = self._resolve(args.warmup_iters, total_steps)
        decay_iters = self._resolve(args.lr_decay_iters, total_steps)

        def fn(it):
            return schedule_value(it, kind=args.lr_schedule, lr=args.lr,
                                  min_lr=args.min_lr, warmup_iters=warmup,
                                  lr_decay_iters=decay_iters)
        return fn


def schedule_value(it, *, kind, lr, min_lr, warmup_iters, lr_decay_iters):
    """Pure schedule math, traceable (ha/optim.py:27-66 semantics).

    Host callers (the training loops log lr EVERY iteration) get pure
    numpy: on the tunneled backend a jnp scalar here would cost a
    device round trip + full queue sync per iteration (~30-40 ms,
    measured — it dominated hala's wall time over the 69 ms step).
    Inside jit the same expressions trace as jnp ops.
    """
    import numpy as _host_np
    xp = jnp if isinstance(it, (jax.core.Tracer, jax.Array)) else _host_np
    it = xp.asarray(it, xp.float32)
    if kind == 'const':
        return xp.full_like(it, lr)
    if kind == 'noam':
        d_model = 768.0
        it1 = xp.maximum(it, 1.0)
        return d_model * xp.minimum(it1 ** -0.5, it1 * warmup_iters ** -1.5)
    warm = lr * it / max(warmup_iters, 1)
    if kind == 'cosine':
        ratio = (it - warmup_iters) / max(lr_decay_iters - warmup_iters, 1)
        ratio = xp.clip(ratio, 0.0, 1.0)
        coeff = 0.5 * (1.0 + xp.cos(xp.pi * ratio))
        main = min_lr + coeff * (lr - min_lr)
    else:  # linear
        slope = (lr - min_lr) / max(lr_decay_iters - warmup_iters, 1)
        main = xp.clip(lr - (it - warmup_iters) * slope, min_lr, lr)
    return xp.where(it < warmup_iters, warm,
                    xp.where(it > lr_decay_iters, min_lr, main))


NO_DECAY_TOKENS = ("ln_", "ln1", "ln2", "norm", "wpe", "wte", "embedding",
                   "lm_head", "wte_norm", "ln_f", "ln_time", "ln_chan")


def decay_mask(params):
    """True = apply weight decay. Decided from pytree paths, mirroring the
    module-type partition of ha/optim.py:83-120."""

    def decide(path):
        names = [str(getattr(k, "key", getattr(k, "idx", k))) for k in path]
        leaf = names[-1]
        if leaf.startswith("bias") and "_l" not in leaf:
            return False                     # biases (LSTM bias_*_l{k} decays)
        for n in names[:-1]:
            low = n.lower()
            if any(tok in low for tok in NO_DECAY_TOKENS):
                return False
        if leaf == "weight":
            return True                      # Linear / Conv weights
        if leaf.startswith(("weight_ih", "weight_hh", "bias_ih", "bias_hh")):
            return True                      # LSTM params all decay (quirk)
        return False

    return jax.tree_util.tree_map_with_path(lambda p, _: decide(p), params)


def configure_optimizers(params, args, total_steps=200000):
    """AdamW with masked weight decay + injected LR schedule.
    Returns (optax.GradientTransformation, opt_state)."""
    lr = LR(args)
    tx = optax.adamw(
        learning_rate=lr.schedule_fn(total_steps),
        b1=args.beta1, b2=args.beta2,
        weight_decay=args.weight_decay,
        mask=decay_mask)
    return tx, tx.init(params)
