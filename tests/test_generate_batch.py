"""Left-padded batched generation (gpt.generate(prompt_lengths=...))
must emit, per row, exactly the stream a solo generate on that row's
unpadded prompt emits — pads are attention-masked and positions count
from each row's own start. This is the hat --batch serving surface
(one weight stream amortized over B prompts; the reference streams one
prompt at a time, ha/attention.py:284-325).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from haloop_tpu.models import gpt as G


def tiny_cfg(**kw):
    base = dict(block_size=64, vocab_size=97, n_layer=2, n_head=2,
                n_embd=32, bias=True)
    base.update(kw)
    return G.GPTConfig(**base)


PROMPTS = [[5, 9, 2], [7, 1, 3, 4, 8, 11, 2], [1]]


def left_pad(prompts, pad=0):
    t0 = max(len(p) for p in prompts)
    ids = np.full((len(prompts), t0), pad, np.int32)
    for b, p in enumerate(prompts):
        ids[b, t0 - len(p):] = p
    return jnp.asarray(ids), jnp.asarray([len(p) for p in prompts],
                                         jnp.int32)


@pytest.mark.parametrize("rotary", [0, 8], ids=["wpe", "rotary"])
def test_batched_greedy_matches_solo(rotary):
    cfg = tiny_cfg(rotary_emb_dim=rotary)
    params = G.gpt_init(jax.random.PRNGKey(0), cfg)
    new = 12

    ids, lens = left_pad(PROMPTS)
    toks, alive = G.generate(params, cfg, ids, new, top_k=1,
                             stop_token=-1, prompt_lengths=lens)

    for b, p in enumerate(PROMPTS):
        solo, _ = G.generate(params, cfg,
                             jnp.asarray([p], jnp.int32), new,
                             top_k=1, stop_token=-1)
        np.testing.assert_array_equal(
            np.asarray(toks[b]), np.asarray(solo[0]),
            err_msg=f"row {b} (len {len(p)}) diverged from solo decode")


def test_batched_equal_lengths_matches_plain():
    """prompt_lengths covering the full width must be a no-op vs the
    plain (no-padding) path."""
    cfg = tiny_cfg()
    params = G.gpt_init(jax.random.PRNGKey(1), cfg)
    ids = jnp.asarray(np.random.default_rng(0).integers(1, 97, (3, 5)),
                      jnp.int32)
    a, _ = G.generate(params, cfg, ids, 8, top_k=1, stop_token=-1)
    b, _ = G.generate(params, cfg, ids, 8, top_k=1, stop_token=-1,
                      prompt_lengths=jnp.full((3,), 5, jnp.int32))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_batched_stop_token_masks_rows_independently():
    cfg = tiny_cfg()
    params = G.gpt_init(jax.random.PRNGKey(0), cfg)
    ids, lens = left_pad(PROMPTS)
    toks, alive = G.generate(params, cfg, ids, 12, top_k=1,
                             stop_token=-1, prompt_lengths=lens)
    stop = int(np.asarray(toks[0])[3])  # force a stop mid-stream, row 0
    toks2, alive2 = G.generate(params, cfg, ids, 12, top_k=1,
                               stop_token=stop, prompt_lengths=lens)
    a = np.asarray(alive2)
    t = np.asarray(toks2)
    # row 0 dies at (or before) the forced stop; once dead, stays dead
    row = a[0].astype(int)
    assert row.min() == 0, "row 0 never hit the stop token"
    assert (np.diff(row) <= 0).all(), "alive mask re-awoke after stop"
    # tokens up to the stop are unchanged vs the stop-free run
    k = row.sum()
    np.testing.assert_array_equal(t[0][:k], np.asarray(toks[0])[:k])
