import itertools
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from haloop_tpu.ops.beam import ctc_beam_search_decode_logits
from haloop_tpu.ops.ctc import ctc_forward_score


def exact_best_labeling(log_probs, max_len, V):
    """Brute force: score every label sequence with the CTC lattice."""
    T = log_probs.shape[0]
    best, best_score = (), -np.inf
    for L in range(1, max_len + 1):
        for seq in itertools.product(range(1, V), repeat=L):
            tg = jnp.array([seq], jnp.int32)
            score = -float(ctc_forward_score(
                jnp.asarray(log_probs)[:, None, :], tg,
                jnp.array([T]), jnp.array([L]))[0])
            if score > best_score:
                best, best_score = seq, score
    return best, best_score


@pytest.mark.parametrize("seed", [0, 1])
def test_beam_finds_exact_best(seed):
    rng = np.random.default_rng(seed)
    T, V = 5, 4
    logits = rng.normal(size=(T, V)).astype(np.float32) * 2
    log_probs = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), -1))

    hyps = ctc_beam_search_decode_logits(log_probs, beam_width=64, topk=1)
    beam_best, beam_score = hyps[0]

    exact, exact_score = exact_best_labeling(log_probs, max_len=4, V=V)
    if beam_best == ():
        # all-blank wins: verify its mass beats the best labeling
        blank_mass = log_probs[:, 0].sum()
        assert blank_mass >= exact_score - 1e-6
    else:
        assert beam_best == exact
        np.testing.assert_allclose(beam_score, exact_score, rtol=1e-5)


def test_beam_scores_match_lattice():
    """The beam's accumulated prefix mass must equal the CTC lattice
    likelihood of that labeling."""
    rng = np.random.default_rng(3)
    T, V = 6, 5
    log_probs = np.asarray(jax.nn.log_softmax(
        jnp.asarray(rng.normal(size=(T, V)).astype(np.float32) * 2), -1))
    hyps = ctc_beam_search_decode_logits(log_probs, beam_width=128, topk=5)
    for prefix, score in hyps:
        if not prefix:
            continue
        tg = jnp.array([list(prefix)], jnp.int32)
        lattice = -float(ctc_forward_score(
            jnp.asarray(log_probs)[:, None, :], tg, jnp.array([T]),
            jnp.array([len(prefix)]))[0])
        np.testing.assert_allclose(score, lattice, rtol=1e-5, atol=1e-6)
