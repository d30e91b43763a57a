"""Star Temporal Classification (Pratap'22, arXiv:2201.12208).

CTC over partially-labeled data: a label sequence A B C is matched as the
regex-like pattern ``[^A]+ A [^B]+ B [^C]+ C .*`` using a doubled
vocabulary where ``<star>`` aggregates all non-blank symbols and
``<star>\\t`` aggregates all non-blank symbols except ``t``.

Behavioral parity with the reference (ha/star.py:65-163): same doubled
vocabulary construction, same 4S+3 interspersed state layout
(blank, <star>\\t, blank, t, ..., blank, <star>, blank), the same
transition stencil including the backward edge from the blank following a
star (so stars can re-fire across blanks), ``star_penalty`` added on
entry into star states, and the terminal score as the logadd of the final
four states.

TPU-native design: a single ``lax.scan`` over time; the state update is a
vectorized 6-point stencil with mask selects — no per-state Python loops.
"""

import jax
import jax.numpy as jnp

from haloop_tpu.ops.semiring import NEG_INF, logaddexp, logsubexp
from haloop_tpu.ops.ctc import intersperse_blanks


def intersperse_stars(log_probs, targets, penalty=0.0):
    """Build star vocabulary + star-interleaved targets.

    Args:
      log_probs: (T, N, V) log-softmax emissions, blank at 0.
      targets: (N, S) labels.
    Returns:
      star_log_probs: (T, N, 2V) — position V is <star> (logsumexp of all
        non-blank), positions V+t are <star>\\t = logsubexp(<star>, t).
      star_targets: (N, 2S+1) — [V+t1, t1, V+t2, t2, ..., V].
    """
    T, N, V = log_probs.shape
    nonblank = log_probs[:, :, 1:]
    mx = jax.lax.stop_gradient(jnp.max(nonblank, axis=-1, keepdims=True))
    star = jnp.log(jnp.sum(jnp.exp(nonblank - mx), axis=-1, keepdims=True)) + mx
    starsub = logsubexp(star, nonblank) + penalty
    star_log_probs = jnp.concatenate([log_probs, star + penalty, starsub], axis=-1)

    n, s = targets.shape
    star_targets = jnp.stack([V + targets, targets], axis=-1).reshape(n, 2 * s)
    star_targets = jnp.concatenate(
        [star_targets, jnp.full((n, 1), V, targets.dtype)], axis=-1)
    return star_log_probs, star_targets


def star_ctc_forward_score(log_probs, targets, input_lengths, target_lengths,
                           star_penalty=-0.5, animate=False):
    """Per-sequence positive NLL of the star-CTC lattice.

    Args mirror ``ctc_forward_score``; ``star_penalty`` is added on every
    transition entering a star state. ``animate=True`` prints the evolving
    trellis one frame per step (debug parity with ha/star.py:150-152;
    runs the same stencil eagerly instead of under ``lax.scan``).
    """
    T, N, C = log_probs.shape
    emissions, star_targets = intersperse_stars(log_probs, targets)
    ext = intersperse_blanks(star_targets)                 # (N, 4S+3)
    S_ = ext.shape[1]
    PAD = 4  # leading pad states so every stencil offset is in range

    pos = jnp.arange(S_)
    is_blank = pos % 2 == 0
    is_star = pos % 4 == 1
    # label state s matches the previous label at s-4
    prev_label = jnp.pad(ext, ((0, 0), (4, 0)), constant_values=-1)[:, :S_]
    same_as_prev = (pos % 4 == 3) & (ext == prev_label)

    emit = jnp.take_along_axis(emissions, ext[None].repeat(T, axis=0), axis=-1)

    s_last = PAD + 4 * target_lengths + 2   # final blank (padded coords)
    t_last = input_lengths - 1

    def final_score(padded):
        # logadd of the last four states: final blank, star, blank, label
        idx = s_last[:, None] - jnp.arange(4)[None, :]
        vals = jnp.take_along_axis(padded, idx, axis=-1)
        out = vals[:, 0]
        for k in range(1, 4):
            out = logaddexp(out, vals[:, k])
        return out

    # alpha is stored padded: [PAD virtual states | S_ states | 1 trailing]
    alpha0 = jnp.full((N, PAD + S_ + 1), NEG_INF)
    alpha0 = alpha0.at[:, :PAD].set(0.0)   # virtual start states
    alpha0 = alpha0.at[:, -1].set(-7007.7007)

    def step(carry, inp):
        alpha, final = carry
        emit_t, t = inp
        from_prev_label = alpha[:, 0:-5]
        from_first_blank = alpha[:, 1:-4]
        from_star = alpha[:, 2:-3]
        from_prev = alpha[:, 3:-2]
        from_self = alpha[:, 4:-1]
        from_star_blank = alpha[:, 5:]

        from_prev_or_self = logaddexp(from_prev, from_self)
        reach = logaddexp(logaddexp(from_first_blank, from_prev), from_star)
        into_blank = from_prev_or_self
        into_star = logaddexp(from_prev_or_self, from_star_blank) + star_penalty
        into_diff_label = logaddexp(reach, from_prev_label)
        into_same_label = reach

        trans = jnp.where(is_blank, into_blank,
                          jnp.where(is_star, into_star,
                                    jnp.where(same_as_prev, into_same_label,
                                              into_diff_label)))
        new = jnp.full_like(alpha, NEG_INF)
        new = new.at[:, -1].set(-7007.7007)
        new = new.at[:, PAD:-1].set(trans + emit_t)
        final = jnp.where(t == t_last, final_score(new), final)
        return (new, final), None

    if animate:
        import time

        carry = (alpha0, jnp.full((N,), NEG_INF))
        for t in range(T):
            carry, _ = step(carry, (emit[t], jnp.int32(t)))
            print(jnp.asarray(carry[0][min(1, N - 1), PAD:-1]))
            time.sleep(0.5)
        return -carry[1]

    (alpha, final), _ = jax.lax.scan(
        step, (alpha0, jnp.full((N,), NEG_INF)), (emit, jnp.arange(T)))
    return -final
