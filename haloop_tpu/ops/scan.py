"""Parallel first-order recurrence solvers (log-semiring and affine).

TPU-native replacements for the reference's hand-written Blelloch
up/down-sweep scans (reference: ha/scan.py:24-126). On TPU the right
primitive is ``jax.lax.associative_scan`` — XLA maps it to a
work-efficient parallel scan without manual power-of-2 padding.

Recurrences solved (same semantics as the reference):
  scanrec:      y[i] = b[i] + w[i] * y[i-1]          (affine, real semiring)
  scanrec_log:  y[i] = b[i] logaddexp (w[i] + y[i-1]) (log semiring)

Both accept a leading scan axis; extra axes broadcast elementwise, so a
batch of independent recurrences is one call.
"""

import jax
import jax.numpy as jnp

from haloop_tpu.ops.semiring import NEG_INF, logaddexp


def scan(x, axis=0):
    """Parallel prefix sum (inclusive). Equivalent to cumsum, via associative_scan."""
    return jax.lax.associative_scan(jnp.add, x, axis=axis)


def _affine_combine(left, right):
    # Composition of y -> b + w*y maps: (w2, b2) after (w1, b1)
    w1, b1 = left
    w2, b2 = right
    return w1 * w2, b2 + w2 * b1


def scanrec(w, b, axis=0):
    """Solve y[i] = b[i] + w[i] * y[i-1] with y[-1] = 0, in parallel."""
    _, y = jax.lax.associative_scan(_affine_combine, (w, b), axis=axis)
    return y


def _log_combine(left, right):
    # Log-semiring composition of y -> b logaddexp (w + y) maps.
    w1, b1 = left
    w2, b2 = right
    return w1 + w2, logaddexp(b2, w2 + b1)


def scanrec_log(w, b, axis=0):
    """Solve y[i] = b[i] logaddexp (w[i] + y[i-1]) with y[-1] = -inf, in parallel.

    Matches reference semantics (ha/scan.py:88-126) with the initial state
    at -inf (the reference uses -10000 as its sentinel; we use NEG_INF
    absorbed into b[0] implicitly: y[0] = b[0]).
    """
    _, y = jax.lax.associative_scan(_log_combine, (w, b), axis=axis)
    return y


def scanrec_sequential(w, b, axis=0):
    """Sequential oracle for scanrec (lax.scan over the axis)."""
    w = jnp.moveaxis(w, axis, 0)
    b = jnp.moveaxis(b, axis, 0)

    def step(y, wb):
        wi, bi = wb
        y = bi + wi * y
        return y, y

    _, ys = jax.lax.scan(step, jnp.zeros_like(b[0]), (w, b))
    return jnp.moveaxis(ys, 0, axis)


def scanrec_log_sequential(w, b, axis=0):
    """Sequential oracle for scanrec_log."""
    w = jnp.moveaxis(w, axis, 0)
    b = jnp.moveaxis(b, axis, 0)

    def step(y, wb):
        wi, bi = wb
        y = logaddexp(bi, wi + y)
        return y, y

    _, ys = jax.lax.scan(step, jnp.full_like(b[0], NEG_INF), (w, b))
    return jnp.moveaxis(ys, 0, axis)
