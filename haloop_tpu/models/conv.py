"""Convolutional frontends (reference: ha/conv.py).

Feature-last (N, T, C) layout throughout — the natural TPU layout (lanes
= channels). ``DWConv1d`` is a depthwise-separable conv; ``ConvEncoder``
is a GELU-activated stride stack with conv-arithmetic length tracking.
"""

import jax
import jax.numpy as jnp

from haloop_tpu.nn.core import conv1d, conv1d_init, new_gelu


def dwconv1d_init(key, in_channels, out_channels, kernel_size=3, bias=True):
    k1, k2 = jax.random.split(key)
    return {
        "depthwise": conv1d_init(k1, in_channels, in_channels, kernel_size,
                                 bias=bias, groups=in_channels),
        "pointwise": conv1d_init(k2, in_channels, out_channels, 1, bias=bias),
    }


def dwconv1d(p, x, stride=1, padding=1):
    groups = p["depthwise"]["weight"].shape[0]
    x = conv1d(p["depthwise"], x, stride=stride, padding=padding, groups=groups)
    return conv1d(p["pointwise"], x)


def conv_encoder_init(key, input_dim, hidden_dim, output_dim, strides,
                      kernel_size=3):
    keys = jax.random.split(key, len(strides))
    layers = [conv1d_init(keys[0], input_dim, hidden_dim, kernel_size)]
    for i, _ in enumerate(strides[1:-1], start=1):
        layers.append(dwconv1d_init(keys[i], hidden_dim, hidden_dim, kernel_size))
    layers.append(dwconv1d_init(keys[-1], hidden_dim, output_dim, kernel_size))
    return {"conv": layers}


def layer_strides(strides):
    """One stride per LAYER of the conv stack. The reference builds
    ``[Conv1d(s_0)] + [DWConv1d(s) for s in strides[1:-1]] +
    [DWConv1d(s_last)]`` (ha/conv.py ConvEncoder), so a single-stride
    config still has TWO layers, both at that stride — apply and
    length-count per layer, not per stride."""
    return [strides[0], *strides[1:-1], strides[-1]]


def conv_encoder_subsampled_lengths(strides, input_lengths, kernel_size=3,
                                    padding=1):
    o = input_lengths
    for s in layer_strides(strides):
        o = jnp.floor((o + 2 * padding - kernel_size) / s + 1)
    return o.astype(jnp.int32)


def conv_encoder(p, x, input_lengths, strides, kernel_size=3):
    """x: (N, T, C) -> (N, T', C'), with GELU after every conv layer."""
    ls = layer_strides(strides)
    x = new_gelu(conv1d(p["conv"][0], x, stride=ls[0], padding=1))
    for layer, s in zip(p["conv"][1:], ls[1:]):
        x = new_gelu(dwconv1d(layer, x, stride=s, padding=1))
    return x, conv_encoder_subsampled_lengths(strides, input_lengths,
                                              kernel_size=kernel_size)
