"""FixupResNet r9 parity vs the reference torch implementation:
same (transplanted) weights must give the same features, including the
channel-major feature flattening (ha/resnet.py:140-141)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from haloop_tpu.models import resnet as RN

torch = pytest.importorskip("torch")


def _to_torch_sd(params):
    """Our NHWC/HWIO pytree -> the reference's flat OIHW state dict."""
    sd = {}

    def conv_w(p):
        return torch.tensor(np.asarray(p["weight"]).transpose(3, 2, 0, 1))

    sd["conv1.weight"] = conv_w(params["conv1"])
    for scalar in ("bias1", "bias2"):
        sd[scalar] = torch.tensor(np.asarray(params[scalar]))
    for name in ("layer1", "layer2", "layer3"):
        for i, block in enumerate(params[name]):
            base = f"{name}.{i}."
            for scalar in ("bias1a", "bias1b", "bias2a", "bias2b", "scale"):
                sd[base + scalar] = torch.tensor(np.asarray(block[scalar]))
            sd[base + "conv1.weight"] = conv_w(block["conv1"])
            sd[base + "conv2.weight"] = conv_w(block["conv2"])
    return sd


def test_fixup_resnet_matches_reference():
    import sys
    sys.path.insert(0, "/root/reference")
    from ha.resnet import FixupResNet, FixupBasicBlock

    params = RN.fixup_resnet_init(jax.random.PRNGKey(0), layers=(2, 2, 2))
    # nonzero conv2/scalars so the flattening order is actually probed
    rng = np.random.default_rng(1)

    def perturb(tree):
        return jax.tree.map(
            lambda x: jnp.asarray(
                rng.normal(scale=0.05, size=x.shape).astype(np.float32))
            + x, tree)

    params = perturb(params)

    ref = FixupResNet(FixupBasicBlock, [2, 2, 2])
    ref.load_state_dict(_to_torch_sd(params), strict=True)
    ref.eval()

    N, T, C = 2, 32, 40
    x = rng.normal(size=(N, T, C)).astype(np.float32)
    lengths = np.array([T, T - 8])

    ours, our_lens, _ = RN.fixup_resnet_apply(
        params, jnp.asarray(x), jnp.asarray(lengths))
    with torch.no_grad():
        want, want_lens, _ = ref(torch.tensor(x), torch.tensor(lengths))

    assert ours.shape == tuple(want.shape), (ours.shape, want.shape)
    np.testing.assert_allclose(np.asarray(ours), want.numpy(),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(our_lens), want_lens.numpy())
