"""GPTConfig-based audio encoders (reference: ha/attention_audio.py).

AudioEncoder: Whisper-style conv pre + stride-2 subsample, then GPT
blocks with either frozen sinusoid absolute positions or rotary
embeddings. StridingAudioEncoder: 3-stage conv stack (full conv then two
depthwise-separable convs, strides from config) + rotary GPT blocks.
Both return (features, subsampled_lengths, stats).
"""

import dataclasses
import math

import jax
import jax.numpy as jnp

from haloop_tpu.nn.core import (
    conv1d, conv1d_init, dropout, layer_norm, layer_norm_init, new_gelu)
from haloop_tpu.models.conv import (
    conv_encoder, conv_encoder_init, conv_encoder_subsampled_lengths)
from haloop_tpu.models.gpt import GPTConfig, _block_init, _block_apply


@dataclasses.dataclass(frozen=True)
class AudioEncoderConfig(GPTConfig):
    block_size: int = 2048
    vocab_size: int = 128
    causal: bool = False
    d_input: int = 80
    rotary_emb_dim: int = 64


@dataclasses.dataclass(frozen=True)
class StridingAudioEncoderConfig(GPTConfig):
    block_size: int = 2048
    vocab_size: int = 16384
    causal: bool = False
    d_input: int = 80
    rotary_emb_dim: int = 64
    d_conv: int = 256
    conv_strides: tuple = (2, 2, 2)


def sinusoids(length, channels, max_timescale=10000):
    """Whisper-style positional table (ha/attention_audio.py:10-16)."""
    scales = jnp.arange(channels // 2) / (channels // 2 - 1)
    inv = jnp.exp(-math.log(max_timescale) * scales)
    t = jnp.arange(length)[:, None] * inv[None, :]
    return jnp.concatenate([jnp.sin(t), jnp.cos(t)], axis=1)


def audio_encoder_init(key, cfg: AudioEncoderConfig):
    ks = jax.random.split(key, cfg.n_layer + 3)
    p = {
        "conv_pre": conv1d_init(ks[0], cfg.d_input, cfg.n_embd, 3),
        "conv_subsample": conv1d_init(ks[1], cfg.n_embd, cfg.n_embd, 3),
        "transformer": {
            "h": [_block_init(ks[2 + i], cfg) for i in range(cfg.n_layer)],
            "ln_f": layer_norm_init(cfg.n_embd, bias=cfg.bias),
        },
    }
    if not cfg.rotary_emb_dim:
        # frozen sinusoid positions
        p["transformer"]["wpe"] = {
            "weight": sinusoids(cfg.block_size, cfg.n_embd)}
    return p


def audio_encoder_subsampled_lengths(cfg, input_lengths):
    return jnp.floor((input_lengths + 2 * 1 - 3) / 2 + 1).astype(jnp.int32)


def audio_encoder_apply(p, cfg, x, input_lengths, measure_entropy=False,
                        key=None, train=False, collect_activations=False):
    """x: (N, T, d_input) -> (features, lengths, stats)."""
    acts = {}
    x = new_gelu(conv1d(p["conv_pre"], x, stride=1, padding=1))
    x = new_gelu(conv1d(p["conv_subsample"], x, stride=2, padding=1))
    if collect_activations:
        acts["conv"] = x

    T = x.shape[1]
    if not cfg.rotary_emb_dim:
        pe = p["transformer"]["wpe"]["weight"][:T]
        x = x + jax.lax.stop_gradient(pe)[None]   # frozen positions
    kd = None
    if key is not None:
        kd, key = jax.random.split(key)
    x = dropout(kd, x, cfg.dropout, deterministic=not train)

    for i, block in enumerate(p["transformer"]["h"]):
        kb = None
        if key is not None:
            kb, key = jax.random.split(key)
        x, _, _ = _block_apply(block, cfg, x, measure_entropy=measure_entropy,
                               key=kb, train=train)
        if collect_activations:
            acts[f"h.{i}"] = x
    x = layer_norm(p["transformer"]["ln_f"], x)
    stats = {"activations": acts} if collect_activations else {}
    return x, audio_encoder_subsampled_lengths(cfg, input_lengths), stats


def striding_audio_encoder_init(key, cfg: StridingAudioEncoderConfig):
    # the conv stack IS a ConvEncoder (the reference builds the same
    # layer list in both classes) — one implementation, models/conv.py
    kc, kt = jax.random.split(key)
    ks = jax.random.split(kt, cfg.n_layer)
    return {
        "conv": conv_encoder_init(kc, cfg.d_input, cfg.d_conv, cfg.n_embd,
                                  cfg.conv_strides)["conv"],
        "transformer": {
            "h": [_block_init(ks[i], cfg) for i in range(cfg.n_layer)],
            "ln_f": layer_norm_init(cfg.n_embd, bias=cfg.bias),
        },
    }


def striding_subsampled_lengths(cfg, input_lengths):
    return conv_encoder_subsampled_lengths(cfg.conv_strides, input_lengths)


def striding_audio_encoder_apply(p, cfg, x, input_lengths,
                                 measure_entropy=False, key=None,
                                 train=False, collect_activations=False):
    acts = {}
    x, _ = conv_encoder({"conv": p["conv"]}, x, input_lengths,
                        cfg.conv_strides)
    if collect_activations:
        acts["conv"] = x

    kd = None
    if key is not None:
        kd, key = jax.random.split(key)
    x = dropout(kd, x, cfg.dropout, deterministic=not train)
    entropies = []
    for i, block in enumerate(p["transformer"]["h"]):
        kb = None
        if key is not None:
            kb, key = jax.random.split(key)
        x, ent, _ = _block_apply(block, cfg, x,
                                 measure_entropy=measure_entropy,
                                 key=kb, train=train)
        entropies.append(ent)
        if collect_activations:
            acts[f"h.{i}"] = x
    x = layer_norm(p["transformer"]["ln_f"], x)
    stats = {}
    if measure_entropy:
        stats["self_entropy"] = entropies
    if collect_activations:
        stats["activations"] = acts
    return x, striding_subsampled_lengths(cfg, input_lengths), stats
