"""Prompt-lookup speculative decoding: output must be BIT-IDENTICAL to
plain greedy generation — drafts (right or wrong) only change how many
model calls it takes."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from haloop_tpu.models import gpt as G


@pytest.fixture(scope="module")
def model():
    cfg = G.GPTConfig(block_size=128, vocab_size=96, n_layer=2, n_head=2,
                      n_embd=32)
    params = G.gpt_init(jax.random.PRNGKey(0), cfg)
    return cfg, params


def greedy_reference(params, cfg, ids, steps):
    toks, alive = G.generate(params, cfg, ids, steps, top_k=1,
                             stop_token=95)
    toks, alive = np.asarray(toks)[0], np.asarray(alive)[0]
    return toks[alive].tolist()


@pytest.mark.parametrize("draft_len", [1, 4, 8])
def test_speculative_equals_greedy(model, draft_len):
    cfg, params = model
    for seed in range(3):
        rng = np.random.default_rng(seed)
        ids = jnp.asarray(rng.integers(1, 90, (1, 7)).astype(np.int32))
        want = greedy_reference(params, cfg, ids, 24)
        got = G.generate_speculative(params, cfg, ids, 24,
                                     draft_len=draft_len, stop_token=95)
        assert got == want, (seed, draft_len, got, want)


def test_speculative_repetitive_prompt(model):
    """A repetitive prompt exercises real n-gram draft hits (accepted
    multi-token blocks) — the path where the cache rewind math must be
    exact."""
    cfg, params = model
    pattern = [5, 9, 13, 5, 9, 13, 5, 9, 13, 5, 9]
    ids = jnp.asarray([pattern], jnp.int32)
    want = greedy_reference(params, cfg, ids, 30)
    got = G.generate_speculative(params, cfg, ids, 30, draft_len=6,
                                 stop_token=95)
    assert got == want, (got, want)


def test_prompt_lookup_draft():
    hist = [1, 2, 3, 4, 9, 9, 2, 3]
    # suffix (2, 3) last occurred at index 1 -> continuation [4, 9, 9, 2]
    assert G._prompt_lookup_draft(hist, 4) == [4, 9, 9, 2]
    # no match -> repeat last
    assert G._prompt_lookup_draft([1, 2, 3], 3, ngram=2) == [3, 3, 3]


def test_learned_draft_equals_greedy(model):
    """A learned draft model (ANY draft model — here a differently
    seeded nano GPT and the model itself) must leave speculative output
    bit-identical to greedy; a self-draft should accept whole blocks."""
    cfg, params = model
    rng = np.random.default_rng(7)
    ids = jnp.asarray(rng.integers(1, 90, (1, 9)).astype(np.int32))
    want = greedy_reference(params, cfg, ids, 24)

    # unrelated draft weights: rejections everywhere, output unchanged
    dcfg = G.GPTConfig(block_size=64, vocab_size=96, n_layer=1, n_head=2,
                       n_embd=16)
    dparams = G.gpt_init(jax.random.PRNGKey(9), dcfg)
    draft = G.make_gpt_draft_fn(dparams, dcfg, 6, window=16)
    got = G.generate_speculative(params, cfg, ids, 24, draft_len=6,
                                 stop_token=95, draft_fn=draft)
    assert got == want, (got, want)

    # the model drafting for itself: perfect drafts once the window
    # holds the full history — still exact, and every block accepts
    self_draft = G.make_gpt_draft_fn(params, cfg, 6, window=48)
    got2 = G.generate_speculative(params, cfg, ids, 24, draft_len=6,
                                  stop_token=95, draft_fn=self_draft)
    assert got2 == want, (got2, want)
