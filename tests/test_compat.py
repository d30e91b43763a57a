"""Checkpoint-compatibility and cached-attention parity tests
(reference quirks from SURVEY.md §5.4)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from haloop_tpu.init import load_model, GPTModel
from haloop_tpu.models import gpt as G


def test_large_checkpoint_defaults(tmp_path):
    """Checkpoints without vocab_size get stable_embedding/50257/bias
    (ha/init.py:66-75) and '_orig_mod.' prefixes are stripped."""
    torch = pytest.importorskip("torch")
    from conftest import reference_module
    ha_attention = reference_module("ha.attention")

    class Cfg:
        block_size = 16; vocab_size = 50257; n_layer = 1; n_head = 2
        n_embd = 16; dropout = 0.0; bias = True; stable_embedding = True
        causal = True; d_input = 1; rotary_emb_dim = 0

    torch.manual_seed(0)
    tmodel = ha_attention.GPT(Cfg()).eval()
    sd = {f"_orig_mod.{k}": v for k, v in tmodel.state_dict().items()}
    # model_args WITHOUT vocab_size => large-checkpoint path
    model_args = {"block_size": 16, "n_layer": 1, "n_head": 2,
                  "n_embd": 16, "dropout": 0.0}
    torch.save({"model": sd, "model_args": model_args},
               tmp_path / "large.pt")

    spec, params = load_model(tmp_path / "large.pt")
    assert spec.config.stable_embedding
    assert spec.config.vocab_size == 50257
    assert spec.config.bias

    ids = np.array([[1, 2, 3]], dtype=np.int64)
    with torch.no_grad():
        tlogits, _ = tmodel(torch.tensor(ids))
    x, _, _ = G._trunk(params, spec.config, jnp.array(ids))
    jlogits = G.lm_logits(params, x)[:, -1:, :]
    np.testing.assert_allclose(np.asarray(jlogits), tlogits.numpy(),
                               rtol=3e-4, atol=3e-4)


def test_stable_embedding_wpe_norm_parity(tmp_path):
    """StableEmbedding wraps wpe too (ha/attention.py:192): a TRAINED
    wpe (non-zero) goes through its own LayerNorm. The fresh-init case
    can't see this (wpe starts zero and LN(0) = 0), so randomize wpe
    and the wpe norm before comparing logits."""
    torch = pytest.importorskip("torch")
    from conftest import reference_module
    ha_attention = reference_module("ha.attention")

    class Cfg:
        block_size = 16; vocab_size = 97; n_layer = 1; n_head = 2
        n_embd = 16; dropout = 0.0; bias = True; stable_embedding = True
        causal = True; d_input = 1; rotary_emb_dim = 0

    torch.manual_seed(1)
    tmodel = ha_attention.GPT(Cfg()).eval()
    with torch.no_grad():
        tmodel.transformer.wpe.weight.normal_(0.0, 0.5)
        tmodel.transformer.wpe.norm.weight.normal_(1.0, 0.1)
        tmodel.transformer.wpe.norm.bias.normal_(0.0, 0.1)
    model_args = {"block_size": 16, "vocab_size": 97, "n_layer": 1,
                  "n_head": 2, "n_embd": 16, "dropout": 0.0, "bias": True,
                  "stable_embedding": True}
    torch.save({"model": tmodel.state_dict(), "model_args": model_args},
               tmp_path / "stable.pt")

    spec, params = load_model(tmp_path / "stable.pt")
    assert "wpe_norm" in params["transformer"], \
        "wpe.norm must be ingested for stable_embedding checkpoints"

    ids = np.array([[1, 2, 3, 4]], dtype=np.int64)
    with torch.no_grad():
        tlogits, _ = tmodel(torch.tensor(ids))
    x, _, _ = G._trunk(params, spec.config, jnp.array(ids))
    jlogits = G.lm_logits(params, x)[:, -1:, :]
    np.testing.assert_allclose(np.asarray(jlogits), tlogits.numpy(),
                               rtol=3e-4, atol=3e-4)


def test_gpt_cached_vs_reference_attend_cached():
    """Our cached GPT attention against the reference's attend_cached
    math (ha/attention.py:64-93)."""
    from conftest import reference_module
    torch = pytest.importorskip("torch")
    ha_attention = reference_module("ha.attention")

    rng = np.random.default_rng(0)
    B, nh, T0, T1, hs = 2, 2, 5, 1, 8
    q = rng.normal(size=(B, nh, T1, hs)).astype(np.float32)
    k = rng.normal(size=(B, nh, T1, hs)).astype(np.float32)
    v = rng.normal(size=(B, nh, T1, hs)).astype(np.float32)
    kc = rng.normal(size=(B, nh, T0, hs)).astype(np.float32)
    vc = rng.normal(size=(B, nh, T0, hs)).astype(np.float32)

    ty, tk, tv, _ = ha_attention.attend_cached(
        torch.tensor(q), torch.tensor(k), torch.tensor(v),
        past=(torch.tensor(kc), torch.tensor(vc)), is_causal=True)

    from haloop_tpu.ops.attention import attend
    jk = jnp.concatenate([jnp.asarray(kc), jnp.asarray(k)], axis=-2)
    jv = jnp.concatenate([jnp.asarray(vc), jnp.asarray(v)], axis=-2)
    # causal with cache shift: the single new token sees everything
    S = T0 + T1
    rows = T0 + jnp.arange(T1)[:, None]
    mask = jnp.arange(S)[None, :] > rows
    jy, _ = attend(jnp.asarray(q), jk, jv, mask=mask)
    np.testing.assert_allclose(np.asarray(jy), ty.numpy(), rtol=1e-4,
                               atol=1e-4)


def test_spin_prompt_scoring(capsys):
    """hac score mode with spin prompts over a words vocab."""
    import jax
    from haloop_tpu.init import create_model
    from haloop_tpu.loop import System, make_parser
    from haloop_tpu.dataloader import Collator, DataLoader
    from haloop_tpu.symbol_tape import WordVocabulary

    vocab = WordVocabulary()
    for t in ["<pad>", "?", "<s>", "</s>", "<↑>", "<↓>"] + \
            [str(i) for i in range(500)]:
        vocab.get_idx(t, extend_vocab=True)

    args = make_parser().parse_args(['--arch', 'e2ctc-d2:512',
                                     '--vocab', '512'])
    spec = create_model(args.arch)
    params = spec.init(jax.random.PRNGKey(0))
    system = System(args, spec, params, vocab)

    from haloop_tpu.data import make_dataset
    loader = DataLoader(make_dataset('head:sinusoids0'), Collator(vocab),
                        batch_size=4)
    system.score(0, loader, tag='score', prompts=['<↑>', '<↓>'], attempts=1)
    out = capsys.readouterr().out
    lines = [l for l in out.splitlines() if l.startswith('score\t')]
    assert lines, out
    cols = lines[0].split('\t')
    assert cols[2] in ('<↑>', '<↓>')
    float(cols[3])  # parsable loss
