"""Weight-only int8 quantization for GPT inference (`hat --q8`,
`hap --q8`).

TPU rationale: single-stream decode is HBM-bandwidth-bound — every
generated token re-reads the full weight set, so halving the bytes the
matmuls stream (bf16 -> int8) is the lever, not arithmetic. Weights
are stored int8 with one fp scale per OUTPUT CHANNEL (absmax
symmetric); `nn.core.linear` computes ``(x @ w_q.T) * qscale`` so XLA
fuses the int8->bf16 convert into the dot's operand read (the int8
bytes are what crosses HBM) and the per-channel scale into the
epilogue. The tied wte/lm_head embedding gathers int8 rows and scales
per row (`nn.core.embedding`).

Opt-in, mirroring `hac --rnn-q8` (nn/lstm_pallas.py int8 recurrence):
quantization error is real (~0.2-0.4% per weight at absmax/127), so
the exact bf16 path stays the default. The reference has no
quantization surface at all (weights load fp32/fp16,
ha/attention.py:381-418); this is a TPU-serving extension.
"""

import jax
import jax.numpy as jnp

# GPT linear leaves worth quantizing: the big matmul weights. wpe and
# layernorms stay fp (tiny, and LN math is fp32 anyway).
_QUANT_KEYS = ("c_attn", "c_proj", "c_fc", "lm_head")


def quantize_weight(w):
    """(out, in) fp weight -> (int8 weight, (out,) fp32 scale).
    Symmetric absmax per output channel (axis 1 reduction — the scale
    broadcast below is hardwired to it); zero rows get scale 1 (their
    quantized values are all zero anyway)."""
    absmax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=1)
    scale = jnp.where(absmax > 0, absmax / 127.0, 1.0)
    q = jnp.clip(jnp.round(w.astype(jnp.float32) / scale[:, None]),
                 -127, 127).astype(jnp.int8)
    return q, scale


def quantize_gpt_params(params):
    """Return a copy of a GPT param tree with every big linear weight
    (c_attn/c_proj/c_fc/lm_head) replaced by {weight: int8,
    qscale: fp32/channel}. LoRA adapter trees (lora_A/lora_B) are left
    fp: they are small and train-time."""

    def walk(node, name=None):
        if isinstance(node, dict):
            if (name in _QUANT_KEYS and "weight" in node
                    and getattr(node["weight"], "ndim", 0) == 2
                    and "lora_A" not in node):
                q, s = quantize_weight(node["weight"])
                out = dict(node)
                out["weight"], out["qscale"] = q, s
                return out
            return {k: walk(v, k) for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            return type(node)(walk(v, name) for v in node)
        return node

    return walk(params)


def dequantize(p):
    """Materialize the fp weight of one quantized linear (tests)."""
    return p["weight"].astype(jnp.float32) * p["qscale"][:, None]
