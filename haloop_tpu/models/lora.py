"""LoRA adapters for GPT attention (reference: ha/lora.py).

Functional formulation: ``attach_to_c_attn`` augments each block's
``c_attn`` param dict with ``lora_A`` (r, in) kaiming-init and
``lora_B`` (out, r) zero-init; the linear apply adds
``(x @ A^T) @ B^T * alpha/r`` with dropout on the LoRA branch. Merging
(eval-time weight fold) and the trainable-only-LoRA mask mirror
ha/lora.py:37-183, 214-217 — masking happens in the optimizer, since
params are plain pytrees.

The rank is always derived from ``lora_A.shape[0]`` and alpha is the
single module constant ``LORA_ALPHA`` so the forward scale, the merge
fold, and the init can never disagree (the reference stores
scaling = alpha/r on the module, ha/lora.py:57).
"""

import math

import jax
import jax.numpy as jnp

from haloop_tpu.nn.core import dropout as dropout_fn
from haloop_tpu.nn.core import uniform_init

LORA_ALPHA = 32


def attach_to_c_attn(params, key, r=4, lora_dropout=0.1):
    """Add LoRA params to every transformer.h[i].attn.c_attn."""
    blocks = params["transformer"]["h"]
    for i, block in enumerate(blocks):
        c = block["attn"]["c_attn"]
        out_f, in_f = c["weight"].shape
        ka = jax.random.fold_in(key, i)
        # torch nn.Linear default: kaiming_uniform_(a=sqrt(5)) == U(+-1/
        # sqrt(fan_in)) — 'a' is the leaky-relu slope inside the gain,
        # NOT a scale (ha/lora.py:66); nn.core.uniform_init is that init
        c["lora_A"] = uniform_init(ka, (r, in_f), 1.0 / math.sqrt(in_f))
        c["lora_B"] = jnp.zeros((out_f, r))
    return params


def lora_linear(p, x, *, p_drop=0.1, key=None, train=False):
    """c_attn apply with the low-rank residual branch."""
    y = x @ p["weight"].T.astype(x.dtype)
    if "bias" in p and p["bias"] is not None:
        y = y + p["bias"].astype(x.dtype)
    if "lora_A" in p:
        r = p["lora_A"].shape[0]
        xin = dropout_fn(key, x, p_drop, deterministic=not train)
        delta = (xin @ p["lora_A"].T.astype(x.dtype)) @ \
            p["lora_B"].T.astype(x.dtype)
        y = y + delta * (LORA_ALPHA / r)
    return y


def merge_lora(params):
    """Fold LoRA weights into the base matrices (eval-time merge,
    ha/lora.py:58-71 semantics)."""
    for block in params["transformer"]["h"]:
        c = block["attn"]["c_attn"]
        if "lora_A" in c:
            r = c["lora_A"].shape[0]
            c["weight"] = c["weight"] + \
                (c["lora_B"] @ c["lora_A"]) * (LORA_ALPHA / r)
            del c["lora_A"], c["lora_B"]
    return params


def lora_trainable_mask(params):
    """True only for lora_* leaves (mark_only_lora_as_trainable_)."""

    def decide(path, _):
        leaf = str(getattr(path[-1], "key", path[-1]))
        return leaf.startswith("lora_")

    return jax.tree_util.tree_map_with_path(decide, params)
