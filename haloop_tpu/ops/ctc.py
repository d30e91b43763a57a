"""CTC forward score (Graves'06) as a batched log-space trellis.

TPU-native design: one ``lax.scan`` over time; each step is a fully
vectorized stencil over the 2S+1 interspersed-blank states for the whole
batch, so XLA fuses it into a handful of VPU ops. Differentiable end to
end (autodiff through the scan yields the standard backward recursion).

Behavioral parity with the reference (ha/ctc.py:110-174):
  * blank index 0, targets padded arbitrarily past ``target_lengths``
  * returns the **positive** per-sequence negative log-likelihood
  * ``ctc_reduce_mean`` divides by target length then averages
"""

import jax
import jax.numpy as jnp

from haloop_tpu.ops.semiring import NEG_INF, logaddexp


def intersperse_blanks(targets, blank=0):
    """(N, S) -> (N, 2S+1): A B C -> _ A _ B _ C _ (ha/star.py:53-62 semantics)."""
    n, s = targets.shape
    blanks = jnp.full_like(targets, blank)
    inter = jnp.stack([blanks, targets], axis=-1).reshape(n, 2 * s)
    return jnp.concatenate([inter, jnp.full((n, 1), blank, targets.dtype)], axis=-1)


def ctc_forward_score(log_probs, targets, input_lengths, target_lengths):
    """Negative log-likelihood of each batch item.

    Args:
      log_probs: (T, N, C) log-softmax emissions; blank = class 0.
      targets: (N, S) int labels (no blanks), padded past target_lengths.
      input_lengths: (N,) valid frames per item.
      target_lengths: (N,) valid labels per item.
    Returns:
      (N,) positive NLL per sequence.
    """
    T, N, C = log_probs.shape
    ext = intersperse_blanks(targets)                       # (N, S_)
    S_ = ext.shape[1]

    is_blank = ext == 0
    # A label state may skip the preceding blank only if it differs from the
    # previous label (positions s and s-2 in the interspersed sequence).
    prev_label = jnp.pad(ext, ((0, 0), (2, 0)), constant_values=-1)[:, :S_]
    no_skip = is_blank | (ext == prev_label)

    # Per-timestep emission for every trellis state: (T, N, S_)
    emit = jnp.take_along_axis(log_probs, ext[None].repeat(T, axis=0), axis=-1)

    alpha0 = jnp.full((N, S_), NEG_INF).at[:, :2].set(emit[0, :, :2])

    s_last = 2 * target_lengths           # index of final blank state
    t_last = input_lengths - 1

    def final_score(alpha):
        idx = jnp.stack([s_last, jnp.maximum(s_last - 1, 0)], axis=-1)  # (N, 2)
        vals = jnp.take_along_axis(alpha, idx, axis=-1)
        # with empty targets (s_last == 0) there is only the blank state;
        # don't count it twice
        second = jnp.where(s_last > 0, vals[:, 1], NEG_INF)
        return logaddexp(vals[:, 0], second)

    def step(carry, inp):
        alpha, final = carry
        emit_t, t = inp
        from_prev = jnp.pad(alpha, ((0, 0), (1, 0)), constant_values=NEG_INF)[:, :S_]
        from_skip = jnp.pad(alpha, ((0, 0), (2, 0)), constant_values=NEG_INF)[:, :S_]
        trans = logaddexp(alpha, from_prev)
        trans = jnp.where(no_skip, trans, logaddexp(trans, from_skip))
        alpha = trans + emit_t
        final = jnp.where(t == t_last, final_score(alpha), final)
        return (alpha, final), None

    final0 = jnp.where(t_last == 0, final_score(alpha0), jnp.full((N,), NEG_INF))
    (alpha, final), _ = jax.lax.scan(
        step, (alpha0, final0), (emit[1:], jnp.arange(1, T)))
    return -final


def ctc_loss(log_probs, targets, input_lengths, target_lengths):
    """Alias with the torch F.ctc_loss-style (positive loss) convention."""
    return ctc_forward_score(log_probs, targets, input_lengths, target_lengths)


def ctc_reduce_mean(losses, target_lengths):
    """Normalize per-sequence losses by target length, then batch-mean
    (ha/ctc.py:177-178 semantics)."""
    return jnp.mean(losses / target_lengths)
