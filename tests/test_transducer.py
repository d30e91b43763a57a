import numpy as np
import pytest
import jax
import jax.numpy as jnp

from haloop_tpu.ops.transducer import (
    transducer_forward_score, transducer_forward_score_sequential)


def random_problem(seed, N=3, T=11, U=4, K=6):
    rng = np.random.default_rng(seed)
    logits = rng.normal(size=(N, T, U + 1, K)).astype(np.float32)
    joint = jax.nn.log_softmax(jnp.array(logits), axis=-1)
    targets = rng.integers(1, K, size=(N, U)).astype(np.int32)
    joint_lengths = rng.integers(U + 1, T + 1, size=(N,)).astype(np.int32)
    target_lengths = rng.integers(1, U + 1, size=(N,)).astype(np.int32)
    return joint, jnp.array(targets), jnp.array(joint_lengths), jnp.array(target_lengths)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_matches_sequential_oracle(seed):
    joint, tg, jl, tl = random_problem(seed)
    got = transducer_forward_score(joint, tg, jl, tl)
    want = transducer_forward_score_sequential(joint, tg, jl, tl)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


def test_matches_reference():
    from conftest import reference_module
    ref = reference_module("ha.transducer")
    import torch
    joint, tg, jl, tl = random_problem(5, N=2, T=16, U=3, K=5)
    want = ref.transducer_forward_score(
        torch.tensor(np.asarray(joint)), torch.tensor(np.asarray(tg)).long(),
        torch.tensor(np.asarray(jl)).long(), torch.tensor(np.asarray(tl)).long())
    got = transducer_forward_score(joint, tg, jl, tl)
    np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=1e-4, atol=1e-4)


def test_grad_finite_and_nonzero():
    joint, tg, jl, tl = random_problem(7)

    def loss(j):
        return jnp.sum(transducer_forward_score(j, tg, jl, tl))

    g = np.asarray(jax.grad(loss)(joint))
    assert np.isfinite(g).all()
    assert np.abs(g).sum() > 0
