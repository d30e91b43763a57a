import numpy as np
import pytest
import jax
import jax.numpy as jnp

from haloop_tpu.ops.ctc import ctc_forward_score, ctc_reduce_mean


def random_problem(seed, T=20, N=3, C=7, S=5):
    rng = np.random.default_rng(seed)
    logits = rng.normal(size=(T, N, C)).astype(np.float32)
    log_probs = jax.nn.log_softmax(jnp.array(logits), axis=-1)
    targets = rng.integers(1, C, size=(N, S)).astype(np.int32)
    input_lengths = rng.integers(2 * S + 1, T + 1, size=(N,)).astype(np.int32)
    target_lengths = rng.integers(1, S + 1, size=(N,)).astype(np.int32)
    return log_probs, jnp.array(targets), jnp.array(input_lengths), jnp.array(target_lengths)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_ctc_matches_torch(seed):
    torch = pytest.importorskip("torch")
    lp, tg, il, tl = random_problem(seed)
    got = ctc_forward_score(lp, tg, il, tl)
    want = torch.nn.functional.ctc_loss(
        torch.tensor(np.asarray(lp)), torch.tensor(np.asarray(tg)),
        torch.tensor(np.asarray(il)), torch.tensor(np.asarray(tl)),
        blank=0, reduction="none")
    np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=1e-4, atol=1e-4)


def test_ctc_matches_reference():
    from conftest import reference_module
    ref = reference_module("ha.ctc")
    import torch
    lp, tg, il, tl = random_problem(7, T=17, N=4, C=6, S=4)
    want = ref.ctc_forward_score3(
        torch.tensor(np.asarray(lp)), torch.tensor(np.asarray(tg)).long(),
        torch.tensor(np.asarray(il)).long(), torch.tensor(np.asarray(tl)).long())
    got = ctc_forward_score(lp, tg, il, tl)
    np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=1e-4, atol=1e-4)


def test_ctc_grad_matches_torch():
    # NOTE: torch's F.ctc_loss backward returns the gradient w.r.t. the
    # pre-log_softmax activations (a documented quirk), so we compare
    # d loss / d logits on both sides.
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(3)
    T, N, C, S = 12, 2, 5, 3
    logits = rng.normal(size=(T, N, C)).astype(np.float32)
    tg = jnp.array(rng.integers(1, C, size=(N, S)), jnp.int32)
    il = jnp.array([12, 9]); tl = jnp.array([3, 2])

    def loss(z):
        lp = jax.nn.log_softmax(z, axis=-1)
        return jnp.sum(ctc_forward_score(lp, tg, il, tl))

    got = jax.grad(loss)(jnp.array(logits))

    tz = torch.tensor(logits, requires_grad=True)
    tlp = torch.log_softmax(tz.double(), dim=-1)
    tloss = torch.nn.functional.ctc_loss(
        tlp, torch.tensor(np.asarray(tg)), torch.tensor(np.asarray(il)),
        torch.tensor(np.asarray(tl)), blank=0, reduction="sum")
    tloss.backward()
    np.testing.assert_allclose(np.asarray(got), tz.grad.numpy(), rtol=1e-3, atol=1e-3)


def test_ctc_reduce_mean():
    losses = jnp.array([4.0, 9.0])
    lens = jnp.array([2, 3])
    np.testing.assert_allclose(ctc_reduce_mean(losses, lens), 2.5)


def test_ctc_repeated_labels():
    torch = pytest.importorskip("torch")
    T, N, C = 15, 1, 4
    rng = np.random.default_rng(11)
    lp = jax.nn.log_softmax(jnp.array(rng.normal(size=(T, N, C)).astype(np.float32)), -1)
    tg = jnp.array([[2, 2, 3, 3, 2]], dtype=jnp.int32)
    il = jnp.array([15]); tl = jnp.array([5])
    got = ctc_forward_score(lp, tg, il, tl)
    want = torch.nn.functional.ctc_loss(
        torch.tensor(np.asarray(lp)), torch.tensor(np.asarray(tg)),
        torch.tensor([15]), torch.tensor([5]), blank=0, reduction="none")
    np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=1e-4, atol=1e-4)


def test_ctc_empty_target_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(0)
    lp = jax.nn.log_softmax(jnp.array(rng.normal(size=(6, 1, 4)),
                                      jnp.float32), -1)
    got = ctc_forward_score(lp, jnp.zeros((1, 1), jnp.int32),
                            jnp.array([6]), jnp.array([0]))
    want = torch.nn.functional.ctc_loss(
        torch.tensor(np.asarray(lp)), torch.zeros(1, 1, dtype=torch.long),
        torch.tensor([6]), torch.tensor([0]), blank=0, reduction="none")
    np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=1e-5)
