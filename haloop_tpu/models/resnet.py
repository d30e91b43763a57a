"""FixupResNet r9 2D encoder (reference: ha/resnet.py).

Fixup initialization replaces BatchNorm: conv1 normal-init scaled by
depth^-0.5, conv2 zero-init, scalar biases/scales around each conv.
TPU layout: NHWC (freq as H, time as W, channels last) so convs hit the
MXU with channels on lanes. Forward: (N, T, C) fbank -> (N, T/4, 256*C/4).
"""

import math

import jax
import jax.numpy as jnp


def _conv3x3_init(key, cin, cout, std):
    return {"weight": jax.random.normal(key, (3, 3, cin, cout)) * std}


def _conv3x3(p, x, stride=1):
    return jax.lax.conv_general_dilated(
        x, p["weight"].astype(x.dtype), (stride, stride), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _block_init(key, inplanes, planes, num_layers, stride=1):
    k1, _ = jax.random.split(key)
    std = math.sqrt(2 / (planes * 9)) * num_layers ** -0.5
    return {
        "bias1a": jnp.zeros((1,)), "bias1b": jnp.zeros((1,)),
        "bias2a": jnp.zeros((1,)), "bias2b": jnp.zeros((1,)),
        "scale": jnp.ones((1,)),
        "conv1": _conv3x3_init(k1, inplanes, planes, std),
        "conv2": {"weight": jnp.zeros((3, 3, planes, planes))},
    }


def _block_apply(p, x, stride=1):
    out = _conv3x3(p["conv1"], x + p["bias1a"], stride=stride)
    out = jax.nn.relu(out + p["bias1b"])
    out = _conv3x3(p["conv2"], out + p["bias2a"])
    out = out * p["scale"] + p["bias2b"]
    if stride != 1:
        # AvgPool2d(1, stride) == strided subsample; channels doubled with zeros
        identity = (x + p["bias1a"])[:, ::stride, ::stride, :]
        identity = jnp.concatenate([identity, jnp.zeros_like(identity)], -1)
    else:
        identity = x
    return jax.nn.relu(out + identity)


def fixup_resnet_init(key, layers=(5, 5, 5)):
    num_layers = sum(layers)
    ks = iter(jax.random.split(key, num_layers + 2))
    std0 = math.sqrt(2 / (64 * 9)) * num_layers ** -0.5
    p = {
        "conv1": _conv3x3_init(next(ks), 1, 64, std0),
        "bias1": jnp.zeros((1,)), "bias2": jnp.zeros((1,)),
        "layer1": [], "layer2": [], "layer3": [],
    }
    inplanes = 64
    for name, planes, n, stride in (("layer1", 64, layers[0], 1),
                                    ("layer2", 128, layers[1], 2),
                                    ("layer3", 256, layers[2], 2)):
        blocks = [_block_init(next(ks), inplanes, planes, num_layers, stride)]
        inplanes = planes
        for _ in range(1, n):
            blocks.append(_block_init(next(ks), planes, planes, num_layers))
        p[name] = blocks
    return p


def fixup_resnet_apply(p, x, input_lengths, measure_entropy=False, key=None,
                       train=False):
    """x: (N, T, C) -> (features (N, T//4, 256*C//4), lengths//4, stats)."""
    N, T, C = x.shape
    h = x.swapaxes(1, 2)[..., None]          # (N, C_freq, T, 1) NHWC
    h = _conv3x3(p["conv1"], h)
    h = jax.nn.relu(h + p["bias1"])
    for name, stride0 in (("layer1", 1), ("layer2", 2), ("layer3", 2)):
        for i, block in enumerate(p[name]):
            h = _block_apply(block, h, stride=stride0 if i == 0 else 1)
    h = h + p["bias2"]
    # (N, H, W, Cn) -> (N, W, Cn*H): the feature axis flattens
    # CHANNEL-major (index c*H + h), matching the reference's
    # view(N, C*H, W).mT (ha/resnet.py:140-141) so checkpoints and
    # downstream recognizer weights transfer either way
    N2, H, W, Cn = h.shape
    h = h.transpose(0, 2, 3, 1).reshape(N2, W, Cn * H)
    return h, input_lengths // 4, {}
