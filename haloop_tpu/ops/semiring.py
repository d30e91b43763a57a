"""Log-semiring primitives with TPU/autodiff-safe masking.

True -inf in log-space lattices produces NaN gradients through
``logaddexp`` (inf - inf). Like the reference's finfo.min masking
(reference: ha/ctc.py:135), we use a large-but-finite negative constant
so every lattice cell stays differentiable; values this negative are
exactly absorbed by logaddexp in fp32.
"""

import jax
import jax.numpy as jnp

# Large negative sentinel: finite (no NaN grads), but small enough that
# exp(NEG_INF) == 0 in fp32 and NEG_INF + NEG_INF does not overflow.
NEG_INF = -1e30


def logaddexp(a, b):
    """Numerically stable log(exp(a) + exp(b)); safe when either is NEG_INF."""
    mx = jnp.maximum(a, b)
    mn = jnp.minimum(a, b)
    # Where both operands are deeply negative the difference may be huge;
    # clamp so exp never overflows/underflows into NaN territory.
    diff = jnp.clip(mn - mx, -80.0, 0.0)
    return mx + jnp.log1p(jnp.exp(diff))


def logsumexp(a, axis=-1, keepdims=False):
    """Stable logsumexp that tolerates NEG_INF-masked entries: a fully
    masked slice returns ~-87 (log of fp32 min-normal) with ZERO — not
    NaN — gradients. The guard must be at least the min NORMAL float:
    1e-38 is denormal and XLA flushes it to zero, making log(0+guard)
    -inf and its gradient NaN."""
    tiny = jnp.finfo(jnp.float32).tiny
    mx = jax.lax.stop_gradient(jnp.max(a, axis=axis, keepdims=True))
    mx = jnp.where(mx < NEG_INF / 2, 0.0, mx)
    out = jnp.log(jnp.sum(jnp.exp(a - mx), axis=axis, keepdims=True)
                  + tiny) + mx
    if not keepdims:
        out = jnp.squeeze(out, axis=axis)
    return out


def logsubexp(a, b):
    """log(exp(a) - exp(b)) for a >= b (reference semantics: ha/star.py:4-5).

    Returns NEG_INF where the difference underflows.
    """
    diff = jnp.clip(b - a, -80.0, 0.0)
    rest = 1.0 - jnp.exp(diff)
    return jnp.where(rest > 0, a + jnp.log(jnp.maximum(rest, 1e-38)), NEG_INF)
