"""Fused-qkv <-> split-q/k/v weight transplants (reference
tests/test_flash_compat.py semantics: outputs must match after moving
weights between the two attention parameterizations)."""

import numpy as np
import jax
import jax.numpy as jnp

from haloop_tpu.models import gpt as G
from haloop_tpu.models import transformer as TR


def test_fused_to_split_attention_parity():
    """GPT's fused c_attn attention == transformer MHA with transplanted
    split weights (self-attention, rotary on both)."""
    cfg = G.GPTConfig(block_size=32, vocab_size=16, n_layer=1, n_head=2,
                      n_embd=16, causal=True, rotary_emb_dim=8)
    params = G.gpt_init(jax.random.PRNGKey(0), cfg)
    attn = params["transformer"]["h"][0]["attn"]

    x = jax.random.normal(jax.random.PRNGKey(1), (2, 7, 16))
    y_fused, _, _ = G._attn(attn, cfg, x)

    split = TR.init_from_fused_qkv(attn["c_attn"]["weight"],
                                   attn["c_proj"]["weight"])
    y_split, _ = TR.mha_apply(split, x, x, heads=2, causal=True, rope=True)
    np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_split),
                               rtol=1e-5, atol=1e-5)


def test_transplant_roundtrip():
    key = jax.random.PRNGKey(3)
    p = TR.mha_init(key, head_dim=8, heads=2)
    wqkv, out = TR.fuse_qkv(p)
    back = TR.init_from_fused_qkv(wqkv, out)
    for name in ("q", "k", "v", "proj"):
        np.testing.assert_array_equal(np.asarray(p[name]["weight"]),
                                      np.asarray(back[name]["weight"]))
