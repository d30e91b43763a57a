"""Audio transformer family (reference: ha/transformer.py).

Architecture parity:
  * MultiHeadAttention with separate q/k/v/proj (bias-free), GPT-J
    interleaved RoPE on self-attention.
  * Block: pre-LN; optional cross-attention over encoder memory, then
    rope'd self-attention — both consume the SAME ln_time(x) (reference
    quirk at ha/transformer.py:480-494, preserved), then GELU MLP.
  * Decoder: teacher-forced training with STX=2/ETX=3 prompt/target
    shift, label dropout keep-prob 0.9, CE ignore_index=0, 'sumeach'
    scoring mode; CTCAttentionDecoder adds 0.3x CTC auxiliary loss.
  * AudioEncoder: ConvEncoder frontend + RoPE blocks (time mask None by
    default, matching ha/transformer.py:244-246).

TPU-native decode: the reference's token-serial python loop with batch
shrinking (ha/transformer.py:124-199) becomes one ``lax.scan`` over a
fixed horizon with an alive mask, preallocated fixed-shape KV caches
updated by dynamic slice, and cross-attention K/V precomputed once.
Self-attention keys are stored PRE-ROTATED in the cache so RoPE costs
O(1) per step instead of re-rotating the whole cache.

Deviation (documented): with a user prompt, all given prompt tokens are
forced during decode; the reference forces only the first (plen=1 at
ha/transformer.py:145 — a latent bug per SURVEY.md §7).
"""

import dataclasses
import math

import jax
import jax.numpy as jnp

from haloop_tpu.nn.core import (
    dropout, embedding, embedding_init, layer_norm, layer_norm_init,
    linear, linear_init, new_gelu)
from haloop_tpu.ops.attention import attend
from haloop_tpu.ops.rope import rotate_interleaved
from haloop_tpu.models.conv import conv_encoder, conv_encoder_init, \
    conv_encoder_subsampled_lengths
from haloop_tpu.models import recognizer as reco

STX, ETX = 2, 3


@dataclasses.dataclass(frozen=True)
class TransformerConfig:
    vocab: int = 512
    head_dim: int = 64
    heads: int = 12
    p_drop: float = 0.2
    layers: int = 12


# ------------------------------------------------------------------- MHA

def mha_init(key, head_dim, heads):
    ks = jax.random.split(key, 4)
    d = head_dim * heads
    return {
        "q": linear_init(ks[0], d, d, bias=False),
        "k": linear_init(ks[1], d, d, bias=False),
        "v": linear_init(ks[2], d, d, bias=False),
        "proj": linear_init(ks[3], d, d, bias=False),
    }


def _split_heads(x, heads):
    N, T, C = x.shape
    return x.reshape(N, T, heads, C // heads).swapaxes(1, 2)  # (N, h, T, hd)


def _merge_heads(x):
    N, h, T, hd = x.shape
    return x.swapaxes(1, 2).reshape(N, T, h * hd)


def mha_apply(p, x, memory, *, heads, mask=None, causal=False,
              kv_lengths=None, measure_entropy=False, rope=False, t0=0,
              key=None, train=False, p_drop=0.0):
    """Full (non-cached) attention: q from x, k/v from memory. Semantic
    masking (causal / kv_lengths) routes to the fused flash kernel."""
    from haloop_tpu.ops.attention import mha
    q = _split_heads(linear(p["q"], x), heads)
    k = _split_heads(linear(p["k"], memory), heads)
    v = _split_heads(linear(p["v"], memory), heads)
    if rope:
        q = rotate_interleaved(q, t0=t0)
        k = rotate_interleaved(k)
    y, ent = mha(q, k, v, mask=mask, causal=causal, t0=t0,
                 kv_lengths=kv_lengths, measure_entropy=measure_entropy)
    y = linear(p["proj"], _merge_heads(y))
    y = dropout(key, y, p_drop, deterministic=not train)
    return y, ent


def init_from_fused_qkv(wqkv, out_proj):
    """Split a fused-QKV attention weight (3d, d) + output projection
    into this module's separate q/k/v/proj params — the flash-MHA ↔
    split-qkv transplant of ha/transformer.py:274-282 and the dormant
    remaps in ha/loop.py:63-97."""
    d = wqkv.shape[0] // 3
    return {
        "q": {"weight": wqkv[0 * d:1 * d]},
        "k": {"weight": wqkv[1 * d:2 * d]},
        "v": {"weight": wqkv[2 * d:3 * d]},
        "proj": {"weight": out_proj},
    }


def fuse_qkv(p):
    """Inverse transplant: split q/k/v -> fused (3d, d) + out_proj."""
    import jax.numpy as jnp
    return jnp.concatenate([p["q"]["weight"], p["k"]["weight"],
                            p["v"]["weight"]], axis=0), p["proj"]["weight"]


def mha_read_memory(p, memory, heads, rope=False):
    """Precompute cross-attention K/V (or pre-rotated self K) once."""
    k = _split_heads(linear(p["k"], memory), heads)
    v = _split_heads(linear(p["v"], memory), heads)
    if rope:
        k = rotate_interleaved(k)
    return k, v


# ----------------------------------------------------------------- Block

def block_init(key, head_dim, heads, memory=False):
    ks = jax.random.split(key, 5)
    d = head_dim * heads
    p = {
        "ln_time": layer_norm_init(d, bias=False),
        "mix_time": mha_init(ks[0], head_dim, heads),
        "ln_chan": layer_norm_init(d, bias=False),
        "mix_chan": {
            "fc": linear_init(ks[1], d, 4 * d, bias=False),
            "proj": linear_init(ks[2], 4 * d, d, bias=False),
        },
    }
    if memory:
        p["mix_memory"] = mha_init(ks[3], head_dim, heads)
    return p


def _mlp(p, x, key, train, p_drop):
    y = linear(p["proj"], new_gelu(linear(p["fc"], x)))
    return dropout(key, y, p_drop, deterministic=not train)


def block_apply(p, x, *, heads, time_mask=None, causal=False, memory=None,
                memory_lengths=None, measure_entropy=False, key=None,
                train=False, p_drop=0.0):
    keys = jax.random.split(key, 3) if key is not None else (None,) * 3
    x_norm = layer_norm(p["ln_time"], x)

    if "mix_memory" in p:
        m, m_ent = mha_apply(p["mix_memory"], x_norm, memory, heads=heads,
                             kv_lengths=memory_lengths,
                             measure_entropy=measure_entropy,
                             key=keys[0], train=train, p_drop=p_drop)
        x = x + m
    else:
        m_ent = jnp.float32(-jnp.inf)

    t, t_ent = mha_apply(p["mix_time"], x_norm, x_norm, heads=heads,
                         mask=time_mask, causal=causal, rope=True,
                         measure_entropy=measure_entropy, key=keys[1],
                         train=train, p_drop=p_drop)
    x = x + t
    x = x + _mlp(p["mix_chan"], layer_norm(p["ln_chan"], x), keys[2], train,
                 p_drop)
    return x, (m_ent, t_ent)


# --------------------------------------------------------------- Decoder

def decoder_init(key, cfg: TransformerConfig):
    d = cfg.head_dim * cfg.heads
    ks = jax.random.split(key, cfg.layers + 2)
    return {
        "wte": embedding_init(ks[0], cfg.vocab, d, std=1.0),
        "h": [block_init(ks[1 + i], cfg.head_dim, cfg.heads, memory=True)
              for i in range(cfg.layers)],
        "ln_f": layer_norm_init(d, bias=False),
        "lm_head": linear_init(ks[-1], d, cfg.vocab, bias=False),
    }


def decoder_forward(p, cfg, features, targets, input_lengths=None,
                    target_lengths=None, star_penalty=None,
                    measure_entropy=False, drop_labels=None, reduction="mean",
                    key=None, train=False):
    """Teacher-forced training loss (reference ha/transformer.py:73-122)."""
    N, T = targets.shape
    prompt = jnp.pad(targets, ((0, 0), (1, 0)), constant_values=STX)
    shifted = jnp.pad(targets, ((0, 0), (0, 1)))
    shifted = shifted.at[jnp.arange(N), target_lengths].set(ETX)

    stats = {"meme_entropy": [], "self_entropy": []}

    if (drop_labels is None and train) or drop_labels:
        kd, key = jax.random.split(key)
        keep = jax.random.bernoulli(kd, 0.9, prompt.shape)
        prompt = jnp.where(keep, prompt, jnp.ones_like(prompt))

    y = embedding(p["wte"], prompt)
    for block in p["h"]:
        kb = None
        if key is not None:
            kb, key = jax.random.split(key)
        y, (m_ent, t_ent) = block_apply(
            block, y, heads=cfg.heads, causal=True, memory=features,
            memory_lengths=input_lengths, measure_entropy=measure_entropy,
            key=kb, train=train, p_drop=cfg.p_drop)
        stats["meme_entropy"].append(m_ent)
        stats["self_entropy"].append(t_ent)

    logits = linear(p["lm_head"], layer_norm(p["ln_f"], y))
    logits = logits.astype(jnp.float32)

    if reduction == "sumeach":
        loss = jnp.sum(jnp.max(jax.nn.log_softmax(logits, -1), axis=-1),
                       axis=-1)
    else:
        lse = jax.scipy.special.logsumexp(logits, axis=-1)
        tgt = jnp.take_along_axis(logits, shifted[..., None],
                                  axis=-1)[..., 0]
        nll = lse - tgt
        valid = shifted != 0                     # CE ignore_index=0
        nll = jnp.where(valid, nll, 0.0)
        if reduction == "mean":
            loss = jnp.sum(nll) / jnp.maximum(jnp.sum(valid), 1)
        elif reduction == "sum":
            loss = jnp.sum(nll)
        else:                                    # 'none': per-token
            loss = nll
    return loss, stats


def decoder_decode(p, cfg, features, input_lengths, target_lengths,
                   prompt=None, max_steps=None, key=None, train=False):
    """Batched greedy decode as one lax.scan with fixed horizon.

    Returns (hyps (N, T) 0-padded, output_lengths, log_probs,
    sum_entropies) — the nested-tensor output of the reference becomes
    padded arrays + lengths.
    """
    N, S, C = features.shape
    heads, head_dim, L = cfg.heads, cfg.head_dim, cfg.layers
    horizon = int(max_steps) if max_steps is not None else None
    if horizon is None:
        raise ValueError("decoder_decode requires static max_steps under jit")

    plen = 0 if prompt is None else prompt.shape[-1]
    T = horizon + 1 + plen
    buf = jnp.full((N, T + 1), ETX, jnp.int32).at[:, 0].set(STX)
    if prompt is not None:
        buf = jax.lax.dynamic_update_slice(buf, prompt.astype(jnp.int32), (0, 1))

    # Cross-attention K/V once per layer; self-attn K cache is pre-rotated.
    mem_kv = [mha_read_memory(block["mix_memory"], features, heads)
              for block in p["h"]]
    mem_mask = (jnp.arange(S)[None, :] >= input_lengths[:, None])[:, None, None, :]

    kv_shape = (L, N, heads, T, head_dim)
    self_k = jnp.zeros(kv_shape, features.dtype)
    self_v = jnp.zeros(kv_shape, features.dtype)

    p_drop = cfg.p_drop if train else 0.0

    def step(carry, t):
        buf, alive, self_k, self_v, log_probs, sum_ent, out_len = carry
        tok = jax.lax.dynamic_slice_in_dim(buf, t, 1, axis=1)      # (N, 1)
        y = embedding(p["wte"], tok)                               # (N, 1, C)
        kt = jax.random.fold_in(key, t) if key is not None else None

        new_k, new_v = self_k, self_v
        for layer, block in enumerate(p["h"]):
            kl = (jax.random.fold_in(kt, layer)
                  if kt is not None else None)
            k0_, k1_, k2_ = ((None, None, None) if kl is None
                             else tuple(jax.random.split(kl, 3)))
            x_norm = layer_norm(block["ln_time"], y)
            mk, mv = mem_kv[layer]
            m, _ = _cached_attend(block["mix_memory"], x_norm, mk, mv,
                                  heads, mem_mask)
            # cross-attn output dropout, matching the training forward
            # (mha_apply) — test-time-dropout decode (train=True) must
            # sample the same stochastic model the loss was trained on
            y = y + dropout(k0_, m, p_drop, not train)
            # self-attention against the growing cache
            q = _split_heads(linear(block["mix_time"]["q"], x_norm), heads)
            q = rotate_interleaved(q, t0=t)
            k1 = _split_heads(linear(block["mix_time"]["k"], x_norm), heads)
            k1 = rotate_interleaved(k1, t0=t)
            v1 = _split_heads(linear(block["mix_time"]["v"], x_norm), heads)
            new_k = jax.lax.dynamic_update_slice(
                new_k, k1[None], (layer, 0, 0, t, 0))
            new_v = jax.lax.dynamic_update_slice(
                new_v, v1[None], (layer, 0, 0, t, 0))
            smask = (jnp.arange(T)[None, :] > t)[None, None, :, :]
            att, _ = attend(q, new_k[layer], new_v[layer], mask=smask)
            y = y + dropout(k1_, linear(block["mix_time"]["proj"],
                                        _merge_heads(att)), p_drop,
                            not train)
            y = y + _mlp(block["mix_chan"], layer_norm(block["ln_chan"], y),
                         k2_, train, p_drop)

        logits = linear(p["lm_head"], layer_norm(p["ln_f"], y[:, -1, :]))
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        greedy = jnp.argmax(logp, axis=-1).astype(jnp.int32)
        gval = jnp.max(logp, axis=-1)

        ent = jnp.sum(jnp.exp(logp) * logp / math.log(2), axis=-1)
        sum_ent = jnp.where(alive, sum_ent + ent, sum_ent)
        out_len = jnp.where(alive, out_len + 1, out_len)
        log_probs = jnp.where(alive, log_probs + gval, log_probs)

        forced = t < plen                      # user prompt region
        nxt = jax.lax.dynamic_slice_in_dim(buf, t + 1, 1, axis=1)[:, 0]
        tokens = jnp.where(forced, nxt, greedy)
        write = jnp.where(alive, tokens, jax.lax.dynamic_slice_in_dim(
            buf, t + 1, 1, axis=1)[:, 0])
        buf = jax.lax.dynamic_update_slice(buf, write[:, None], (0, t + 1))
        alive = alive & (tokens != ETX)
        return (buf, alive, new_k, new_v, log_probs, sum_ent, out_len), None

    init = (buf, jnp.ones((N,), bool), self_k, self_v,
            jnp.zeros((N,), jnp.float32), jnp.zeros((N,), jnp.float32),
            jnp.zeros((N,), jnp.int32))
    (buf, alive, _, _, log_probs, sum_ent, out_len), _ = jax.lax.scan(
        step, init, jnp.arange(T))

    # hypotheses = buf[1:1+len], 0-padded, ETX not included
    hyp = buf[:, 1:]
    mask = jnp.arange(hyp.shape[1])[None, :] < (out_len[:, None] - 1)
    hyp = jnp.where(mask, hyp, 0)
    return hyp, out_len, log_probs, sum_ent


def _cached_attend(p, x_norm, k, v, heads, mask):
    q = _split_heads(linear(p["q"], x_norm), heads)
    y, ent = attend(q, k, v, mask=mask)
    return linear(p["proj"], _merge_heads(y)), ent


# ------------------------------------------------- CTCAttentionDecoder

def ctc_attention_decoder_init(key, cfg: TransformerConfig):
    k1, k2 = jax.random.split(key)
    return {
        "decoder": decoder_init(k1, cfg),
        "recognizer": reco.temporal_classifier_init(
            k2, cfg.head_dim * cfg.heads, cfg.vocab),
    }


def ctc_attention_decoder_forward(p, cfg, features, condtargets,
                                  input_lengths=None, condtarget_lengths=None,
                                  star_penalty=None, measure_entropy=False,
                                  drop_labels=False, key=None, train=False):
    """decoder CE + 0.3x CTC with the single prompt token stripped
    (reference ha/transformer.py:41-54)."""
    targets = condtargets[:, 1:]
    target_lengths = (condtarget_lengths - 1
                      if condtarget_lengths is not None else None)
    k1 = k2 = None
    if key is not None:
        k1, k2 = jax.random.split(key)
    dec_loss, dec_stats = decoder_forward(
        p["decoder"], cfg, features, condtargets, input_lengths,
        condtarget_lengths, star_penalty, measure_entropy, drop_labels,
        key=k1, train=train)
    ctc_loss, ctc_stats = reco.temporal_classifier_loss(
        p["recognizer"], features, targets, input_lengths, target_lengths,
        star_penalty, key=k2, train=train)
    return dec_loss + 0.3 * ctc_loss, {**dec_stats, **ctc_stats}


# ----------------------------------------------------------- AudioEncoder

@dataclasses.dataclass(frozen=True)
class AudioEncoderConfig:
    head_dim: int = 64
    heads: int = 12
    p_drop: float = 0.2
    layers: int = 12
    input_dim: int = 80
    conv_dim: int = 256
    conv_strides: tuple = (2, 2, 2)


def audio_encoder_init(key, cfg: AudioEncoderConfig):
    d = cfg.head_dim * cfg.heads
    ks = jax.random.split(key, cfg.layers + 2)
    return {
        "conv": conv_encoder_init(ks[0], cfg.input_dim, cfg.conv_dim, d,
                                  cfg.conv_strides),
        "h": [block_init(ks[1 + i], cfg.head_dim, cfg.heads)
              for i in range(cfg.layers)],
        "ln_f": layer_norm_init(d, bias=False),
    }


def audio_encoder_apply(p, cfg, x, input_lengths, measure_entropy=False,
                        key=None, train=False, time_mask=None,
                        collect_activations=False):
    """x: (N, T, input_dim) -> (features, lengths, stats). time_mask stays
    None by default (reference quirk ha/transformer.py:244-246)."""
    acts = {}
    x, input_lengths = conv_encoder(p["conv"], x, input_lengths,
                                    cfg.conv_strides)
    if collect_activations:
        acts["conv"] = x
    kd = None
    if key is not None:
        kd, key = jax.random.split(key)
    x = dropout(kd, x, cfg.p_drop, deterministic=not train)

    stats = {"meme_entropy": [], "self_entropy": []}
    for i, block in enumerate(p["h"]):
        kb = None
        if key is not None:
            kb, key = jax.random.split(key)
        x, (m_ent, t_ent) = block_apply(
            block, x, heads=cfg.heads, time_mask=time_mask,
            measure_entropy=measure_entropy, key=kb, train=train,
            p_drop=cfg.p_drop)
        stats["meme_entropy"].append(m_ent)
        stats["self_entropy"].append(t_ent)
        if collect_activations:
            acts[f"h.{i}"] = x
    x = layer_norm(p["ln_f"], x)
    if collect_activations:
        stats["activations"] = acts
    return x, input_lengths, stats


def audio_encoder_subsampled_lengths(cfg, input_lengths):
    return conv_encoder_subsampled_lengths(cfg.conv_strides, input_lengths)
