"""GPT-J style interleaved rotary position embedding.

Parity with the reference ``rotate_interleaved`` (ha/transformer.py:16-31):
frequencies base**(-2i/C) with pairs (x[2i], x[2i+1]) rotated, supporting a
``t0`` offset for KV-cache decoding.
"""

import jax.numpy as jnp


def rotate_interleaved(x, t0=0, base=10000.0, positions=None):
    """x: (..., T, C) with C even. Rotates each adjacent (even, odd) pair.

    ``positions``: optional (T,) absolute positions — or (B, T) per-row
    positions for packed sequences (x then (B, heads, T, C)); defaults
    to t0..t0+T-1.
    """
    T, C = x.shape[-2], x.shape[-1]
    if positions is None:
        positions = t0 + jnp.arange(T, dtype=jnp.float32)
    t = positions.astype(jnp.float32)[..., :, None]            # (..., T, 1)
    exp = jnp.arange(0, C // 2, dtype=jnp.float32)
    exp = -2.0 * jnp.repeat(exp, 2) / C                        # (C,)
    angle = (base ** exp) * t                                  # (..., T, C)
    if angle.ndim == 3 and x.ndim == 4:
        angle = angle[:, None]                                 # head axis
    sin, cos = jnp.sin(angle), jnp.cos(angle)

    odd, even = x[..., 0::2], x[..., 1::2]
    x_rot = jnp.stack([-even, odd], axis=-1).reshape(x.shape)
    return (x * cos + x_rot * sin).astype(x.dtype)
