"""Core layers as pytree params + pure apply functions.

Design: parameters are nested dicts of jnp arrays with torch-style leaf
names (``weight``/``bias``; linear weight stored (out, in), conv1d
(out, in, k)). This makes reference ``.pt`` state-dict ingestion a pure
key-mapping exercise while remaining a plain pytree for jit/pjit/optax.
All applies are pure functions; randomness (dropout) takes explicit keys.
"""

import math
from typing import Optional

import jax
import jax.numpy as jnp

Param = dict  # nested dict pytree of jnp arrays


def uniform_init(key, shape, scale):
    return jax.random.uniform(key, shape, jnp.float32, -scale, scale)


def linear_init(key, in_features, out_features, bias=True, std=None):
    """Torch nn.Linear default init (kaiming-uniform fan_in) unless std given."""
    kw, kb = jax.random.split(key)
    if std is None:
        bound = 1.0 / math.sqrt(in_features)
        w = uniform_init(kw, (out_features, in_features), bound)
    else:
        w = jax.random.normal(kw, (out_features, in_features)) * std
    p = {"weight": w}
    if bias:
        bound = 1.0 / math.sqrt(in_features)
        p["bias"] = uniform_init(kb, (out_features,), bound)
    return p


def linear(p, x):
    if "qscale" in p:
        # weight-only int8 (quant.py). Decode-sized row counts take
        # the Pallas kernel: the int8 bytes are what streams from HBM
        # (XLA hoists the int8->bf16 convert out of decode scans and
        # re-streams bf16 copies — measured 1.02x; the kernel restores
        # the byte halving, ops/q8_matmul.py). Larger row counts are
        # MXU-bound and keep the exact XLA epilogue form.
        from haloop_tpu.ops.q8_matmul import q8_matmul, wants_kernel
        lead = x.shape[:-1]
        x2 = x.reshape(-1, x.shape[-1])
        if wants_kernel(x2, p["weight"]):
            y = q8_matmul(x2, p["weight"], p["qscale"]) \
                .reshape(*lead, -1)
        else:
            y = (x @ p["weight"].T.astype(x.dtype)) * \
                p["qscale"].astype(x.dtype)
        if "bias" in p and p["bias"] is not None:
            y = y + p["bias"].astype(x.dtype)
        return y
    y = x @ p["weight"].T.astype(x.dtype)
    if "bias" in p and p["bias"] is not None:
        y = y + p["bias"].astype(x.dtype)
    return y


def layer_norm_init(dim, bias=True):
    p = {"weight": jnp.ones((dim,))}
    if bias:
        p["bias"] = jnp.zeros((dim,))
    return p


def layer_norm(p, x, eps=1e-5):
    dtype = x.dtype
    x = x.astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    y = (x - mean) * jax.lax.rsqrt(var + eps) * p["weight"]
    if "bias" in p and p["bias"] is not None:
        y = y + p["bias"]
    return y.astype(dtype)


def embedding_init(key, num, dim, std=0.02):
    return {"weight": jax.random.normal(key, (num, dim)) * std}


def embedding(p, ids):
    # clip (not NaN-fill) out-of-range ids: robust to special tokens
    # beyond a small vocab. XLA's scatter-add backward is fine on TPU
    # (3.7 ms for 8k GPT-2-vocab tokens — FASTER than a one-hot matmul
    # formulation, measured with single-scalar fetches; beware per-leaf
    # host fetches skewing microbenchmarks through the remote tunnel).
    e = jnp.take(p["weight"], ids, axis=0, mode="clip")
    if "qscale" in p:
        # tied int8 lm_head used as wte (quant.py): scale per vocab row
        s = jnp.take(p["qscale"], ids, axis=0, mode="clip")
        e = e.astype(s.dtype) * s[..., None]
    return e


def conv1d_init(key, in_channels, out_channels, kernel_size, bias=True, groups=1):
    kw, kb = jax.random.split(key)
    fan_in = in_channels // groups * kernel_size
    bound = 1.0 / math.sqrt(fan_in)
    p = {"weight": uniform_init(kw, (out_channels, in_channels // groups, kernel_size), bound)}
    if bias:
        p["bias"] = uniform_init(kb, (out_channels,), bound)
    return p


def conv1d(p, x, stride=1, padding=0, groups=1):
    """x: (B, T, Cin) feature-last (TPU-friendly); weight torch-layout (O, I/g, K)."""
    pad = padding if isinstance(padding, tuple) else (padding, padding)
    y = jax.lax.conv_general_dilated(
        x, p["weight"].astype(x.dtype),
        window_strides=(stride,), padding=[pad],
        dimension_numbers=("NWC", "OIW", "NWC"),
        feature_group_count=groups,
    )
    if "bias" in p and p["bias"] is not None:
        y = y + p["bias"].astype(x.dtype)
    return y


def new_gelu(x):
    """tanh-approximated GELU (GPT-2 flavor; reference ha/attention.py:12-17)."""
    c = math.sqrt(2.0 / math.pi)
    return 0.5 * x * (1.0 + jnp.tanh(c * (x + 0.044715 * jnp.power(x, 3.0))))


_DROPOUT_DISABLED = False


def no_dropout():
    """Context manager forcing every dropout layer off, regardless of the
    train flag. For deterministic parity checks (e.g. shard_map-DP vs
    single-device to float tolerance) and dropout-free debugging; applies
    at trace time, so enter it before the first call of a jitted step."""
    from contextlib import contextmanager

    @contextmanager
    def ctx():
        global _DROPOUT_DISABLED
        prev = _DROPOUT_DISABLED
        _DROPOUT_DISABLED = True
        try:
            yield
        finally:
            _DROPOUT_DISABLED = prev
    return ctx()


def dropout(key: Optional[jax.Array], x, rate, deterministic):
    if deterministic or rate == 0.0 or key is None or _DROPOUT_DISABLED:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype)
