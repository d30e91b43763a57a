"""RNN-T forward score (Graves'12) via a log-semiring parallel scan.

The lattice alpha(t, u) obeys
  alpha(t, u) = logadd( alpha(t-1, u) + blank(t-1, u),
                        alpha(t, u-1) + emit(t, u-1) )
Each row u is a first-order log-semiring recurrence over t, solved with
a parallel ``scanrec_log`` (associative scan); rows advance with one
``lax.scan`` over u. This mirrors the reference's flood-fill formulation
(ha/transducer.py:175-205) but uses ``jax.lax.associative_scan`` instead
of a hand-rolled Blelloch sweep (no power-of-2 padding needed).

API parity: joint is (N, T, U+1, K) log-softmaxed with blank = 0;
returns the positive NLL  -(alpha[T_n-1, U_n] + blank_prob there).
"""

import jax
import jax.numpy as jnp

from haloop_tpu.ops.semiring import NEG_INF, logaddexp
from haloop_tpu.ops.scan import scanrec_log


def transducer_forward_score(joint, targets, joint_lengths, target_lengths):
    """Batched RNN-T negative log-likelihood.

    Args:
      joint: (N, T, U+1, K) log-probs over vocab K (blank=0).
      targets: (N, U) int labels.
      joint_lengths: (N,) valid T per item.
      target_lengths: (N,) valid U per item.
    Returns: (N,) positive NLL.
    """
    blank = joint[..., 0]                               # (N, T, U+1)
    # Emission log-prob of the u-th target at every (t): (N, T, U)
    emit = jnp.take_along_axis(
        joint[:, :, :-1, :], targets[:, None, :, None].astype(jnp.int32),
        axis=-1)[..., 0]
    return transducer_forward_score_from_parts(
        blank, emit, joint_lengths, target_lengths)


def transducer_forward_score_from_parts(blank, emit, joint_lengths,
                                        target_lengths):
    """Lattice DP given the only two per-(t,u) quantities it consumes:
    blank (N, T, U+1) and emit (N, T, U) log-probs. This entry lets the
    fused joint-lse kernel (ops/joint_pallas.py) feed the DP without a
    (N, T, U+1, V) joint ever existing."""
    N, T, U1 = blank.shape

    # Row u=0: alpha(t, 0) = cumsum of blank(t-1, 0), shifted so alpha(0,0)=0.
    from_left0 = jnp.pad(blank[:, :-1, 0], ((0, 0), (1, 0)))
    row0 = jnp.cumsum(from_left0, axis=-1)              # (N, T)
    # w[t] for row u: blank(t-1, u), with w[0] unused (NEG_INF kills the term)
    w = jnp.pad(blank[:, :-1, :], ((0, 0), (1, 0), (0, 0)),
                constant_values=NEG_INF)                # (N, T, U+1)

    def row(prev_row, u):
        b = prev_row + emit[:, :, u]                    # alpha(t, u) + emit(t, u)
        new_row = scanrec_log(w[:, :, u + 1], b, axis=1)
        return new_row, new_row

    _, rows = jax.lax.scan(row, row0, jnp.arange(U1 - 1))   # (U, N, T)
    alpha = jnp.concatenate([row0[None], rows], axis=0)     # (U+1, N, T)
    alpha = jnp.moveaxis(alpha, 0, -1)                      # (N, T, U+1)

    n = jnp.arange(N)
    final = alpha[n, joint_lengths - 1, target_lengths] + \
        blank[n, joint_lengths - 1, target_lengths]
    return -final


def transducer_forward_score_sequential(joint, targets, joint_lengths,
                                        target_lengths):
    """Slow, obviously-correct oracle: dynamic program with explicit loops
    (used by tests to validate the scan formulation)."""
    import numpy as np
    joint = np.asarray(joint, dtype=np.float64)
    targets = np.asarray(targets)
    out = []
    for n in range(joint.shape[0]):
        Tn = int(joint_lengths[n])
        Un = int(target_lengths[n])
        alpha = np.full((Tn, Un + 1), -np.inf)
        alpha[0, 0] = 0.0
        for t in range(Tn):
            for u in range(Un + 1):
                acc = alpha[t, u] if (t == 0 and u == 0) else -np.inf
                if t > 0:
                    acc = np.logaddexp(acc, alpha[t - 1, u] + joint[n, t - 1, u, 0])
                if u > 0:
                    acc = np.logaddexp(
                        acc, alpha[t, u - 1] + joint[n, t, u - 1, targets[n, u - 1]])
                alpha[t, u] = acc
        out.append(-(alpha[Tn - 1, Un] + joint[n, Tn - 1, Un, 0]))
    return np.array(out, dtype=np.float32)
