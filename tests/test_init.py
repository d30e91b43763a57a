import dataclasses
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from haloop_tpu.init import (
    create_model, load_model, gpt_params_from_state_dict, average_params,
    GPTModel)
from haloop_tpu.checkpoint import (
    Checkpointer, save_checkpoint, load_checkpoint, construct_path_suffix)
from haloop_tpu.models import gpt as G


def test_arch_registry_builds():
    for arch in ['decoder:512:32', 'lstm:64', 'audio-transformer',
                 'e6ctc-d4:96', 'rnnlm', 'audio-encoder-rotary']:
        spec = create_model(arch)
        assert spec is not None


def test_checkpointer_policies(tmp_path):
    ck = Checkpointer(tmp_path / "exp", save="last+best")
    ck(loss=5.0, epoch=0, checkpoint_fn=lambda: {"x": np.ones(3)})
    ck(loss=3.0, epoch=1, checkpoint_fn=lambda: {"x": np.zeros(3)})
    ck(loss=9.0, epoch=2, checkpoint_fn=lambda: {"x": np.full(3, 2.0)})
    best = load_checkpoint(tmp_path / "exp" / "best.pt")
    last = load_checkpoint(tmp_path / "exp" / "last.pt")
    np.testing.assert_array_equal(best["x"], np.zeros(3))
    np.testing.assert_array_equal(last["x"], np.full(3, 2.0))


def test_construct_path_suffix():
    s = construct_path_suffix({"lr": 0.1, "arch": "x/y"}, {"lr": 0.1})
    assert s == "arch-x_y"


def test_average_params():
    a = {"w": np.ones((2,), np.float32)}
    b = {"w": np.full((2,), 3.0, np.float32)}
    avg = average_params([a, b])
    np.testing.assert_allclose(avg["w"], [2.0, 2.0])


def test_pt_loader_roundtrip_gpt_logits(tmp_path):
    """Save a REFERENCE torch GPT checkpoint, ingest it through our
    torch-free pt_loader + key mapping, compare logits."""
    torch = pytest.importorskip("torch")
    from conftest import reference_module
    ha_attention = reference_module("ha.attention")

    class Cfg:
        block_size = 16; vocab_size = 32; n_layer = 2; n_head = 2
        n_embd = 16; dropout = 0.0; bias = True; stable_embedding = False
        causal = True; d_input = 1; rotary_emb_dim = 0

    torch.manual_seed(0)
    tmodel = ha_attention.GPT(Cfg()).eval()
    model_args = {k: getattr(Cfg, k) for k in (
        "block_size", "vocab_size", "n_layer", "n_head", "n_embd", "dropout",
        "bias", "stable_embedding", "causal", "d_input", "rotary_emb_dim")}
    path = tmp_path / "ckpt.pt"
    torch.save({"model": tmodel.state_dict(), "model_args": model_args}, path)

    spec, params = load_model(path)
    assert isinstance(spec, GPTModel)

    ids = np.array([[1, 5, 9, 2, 7]], dtype=np.int64)
    with torch.no_grad():
        tlogits, _ = tmodel(torch.tensor(ids))
    x, _, _ = G._trunk(params, spec.config, jnp.array(ids))
    jlogits = G.lm_logits(params, x)[:, -1:, :]
    np.testing.assert_allclose(np.asarray(jlogits), tlogits.numpy(),
                               rtol=2e-4, atol=2e-4)


def test_native_checkpoint_roundtrip(tmp_path):
    spec = create_model("decoder:64:16")
    params = spec.init(jax.random.PRNGKey(0))
    save_checkpoint(tmp_path / "m.pt", {"model": params,
                                        "model_args": {"arch": "decoder"}})
    back = load_checkpoint(tmp_path / "m.pt")
    flat1 = jax.tree.leaves(params)
    flat2 = jax.tree.leaves(back["model"])
    assert len(flat1) == len(flat2)
    # EVERY leaf round-trips exactly (value, dtype, shape) — a single
    # leaf check would miss reorderings or dtype truncation elsewhere
    for a, b in zip(flat1, flat2):
        a = np.asarray(a)
        assert a.dtype == np.asarray(b).dtype
        np.testing.assert_array_equal(a, np.asarray(b))
    assert back["model_args"] == {"arch": "decoder"}


def test_optim_decay_mask_and_schedule():
    from haloop_tpu.optim import LR, decay_mask, configure_optimizers
    import argparse
    spec = create_model("decoder:64:16")
    params = spec.init(jax.random.PRNGKey(0))
    mask = decay_mask(params)
    # lm_head (tied embedding) must not decay; attn weights must
    assert mask["lm_head"]["weight"] is False
    assert mask["transformer"]["h"][0]["attn"]["c_attn"]["weight"] is True
    assert mask["transformer"]["h"][0]["ln_1"]["weight"] is False

    ns = argparse.Namespace(lr=3e-4, lr_schedule="cosine", warmup_iters=10,
                            lr_decay_iters=100, min_lr=6e-5,
                            weight_decay=0.01, beta1=0.9, beta2=0.99)
    lr = LR(ns)
    assert lr.get_lr(0) == 0.0
    assert abs(lr.get_lr(10) - 3e-4) < 1e-9
    assert abs(lr.get_lr(1000) - 6e-5) < 1e-9
    # fraction-of-total semantics
    ns2 = argparse.Namespace(**{**vars(ns), "warmup_iters": 0.1,
                                "lr_decay_iters": 1.0})
    assert abs(LR(ns2).get_lr(20, total_steps=200) - 3e-4) < 1e-9

    # the host (numpy) and traced (jnp) schedule paths must agree:
    # the loops read get_lr every iteration host-side while optax uses
    # the jitted schedule inside the update (optim.schedule_value)
    from haloop_tpu.optim import schedule_value
    for kind in ("const", "cosine", "linear", "noam"):
        jit_fn = jax.jit(lambda it, k=kind: schedule_value(
            it, kind=k, lr=3e-4, min_lr=6e-5, warmup_iters=10,
            lr_decay_iters=100))
        for it in (0, 1, 5, 10, 55, 99, 100, 101, 500):
            host = schedule_value(it, kind=kind, lr=3e-4, min_lr=6e-5,
                                  warmup_iters=10, lr_decay_iters=100)
            assert abs(float(jit_fn(it)) - float(host)) < 1e-9, (kind, it)

    tx, state = configure_optimizers(params, ns, total_steps=100)
    g = jax.tree.map(jnp.ones_like, params)
    updates, state = tx.update(g, state, params)
    assert np.isfinite(np.asarray(jax.tree.leaves(updates)[0])).all()
