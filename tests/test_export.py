"""Torch .pt export (pt_saver.py + haloop_tpu.export): the write-side
migration path back to the reference stack. Oracles: real torch.load
and the reference GPT model (/root/reference/ha/attention.py)."""

import subprocess
import sys
import textwrap
from pathlib import Path

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from haloop_tpu.pt_saver import save_pt
from haloop_tpu.pt_loader import load_pt

REPO = Path(__file__).resolve().parent.parent


def _tree():
    tied = np.arange(12, dtype=np.float32).reshape(3, 4)
    return {
        "model": {"a.weight": tied, "b.weight": tied,
                  "scale": np.float32(0.5),
                  "steps": np.array(17, dtype=np.int64)},
        "iter_num": 7,
        "args": {"lr": 3e-4, "name": "x"},
        "lst": [np.zeros((2, 2), np.int32), "tag"],
    }


def test_save_pt_round_trips_through_our_loader(tmp_path):
    obj = _tree()
    p = save_pt(tmp_path / "t.pt", obj)
    back = load_pt(p)
    np.testing.assert_array_equal(back["model"]["a.weight"],
                                  obj["model"]["a.weight"])
    assert back["iter_num"] == 7
    assert back["args"]["lr"] == pytest.approx(3e-4)
    assert back["lst"][1] == "tag"
    # numpy scalars export as plain python scalars, not 0-d tensors
    assert isinstance(back["model"]["scale"], float)
    assert back["model"]["steps"] == 17       # 0-d array stays a tensor


def test_save_pt_torch_oracle(tmp_path):
    torch = pytest.importorskip("torch")
    obj = _tree()
    obj["model"]["bf"] = np.ones((4,), jnp.bfloat16.dtype)
    p = save_pt(tmp_path / "t.pt", obj)
    t = torch.load(p, weights_only=True)
    assert torch.allclose(
        t["model"]["a.weight"],
        torch.arange(12, dtype=torch.float32).reshape(3, 4))
    assert t["model"]["bf"].dtype == torch.bfloat16
    assert float(t["model"]["bf"][0]) == 1.0
    # tied arrays share one storage after export (ha/attention.py:203)
    assert t["model"]["a.weight"].data_ptr() == \
        t["model"]["b.weight"].data_ptr()
    assert t["lst"][0].dtype == torch.int32


def test_save_pt_without_torch_loads_in_torch(tmp_path):
    """The stub-module path (torch not importable) writes the same
    format; verified by blocking torch in a child process, then
    torch.load-ing the file here."""
    out = tmp_path / "stub.pt"
    script = textwrap.dedent(f"""
        import sys
        sys.path.insert(0, {str(REPO)!r})
        class _Block:
            def find_spec(self, name, path=None, target=None):
                if name == "torch" or name.startswith("torch."):
                    raise ImportError(name + " blocked")
                return None
        sys.meta_path.insert(0, _Block())
        import numpy as np
        from haloop_tpu.pt_saver import save_pt
        save_pt({str(out)!r},
                {{"model": {{"w": np.arange(6, dtype=np.float32)}}}})
        assert "torch" not in sys.modules, "stub leaked"
    """)
    subprocess.run([sys.executable, "-c", script], check=True,
                   env={"PATH": "/usr/bin:/bin", "JAX_PLATFORMS": "cpu",
                        "PALLAS_AXON_POOL_IPS": "",
                        "HOME": "/root"})
    torch = pytest.importorskip("torch")
    t = torch.load(out, weights_only=True)
    assert torch.allclose(t["model"]["w"],
                          torch.arange(6, dtype=torch.float32))


def test_hac_export_loads_in_reference_modules(tmp_path):
    """hac checkpoint -> per-module .pt files -> strict load into the
    reference Encoder/TemporalClassifier (the --init consumption path,
    ha/init.py:282-302)."""
    torch = pytest.importorskip("torch")
    from conftest import reference_module
    ha_rnn = reference_module("ha.rnn")
    ha_recognizer = reference_module("ha.recognizer")
    from haloop_tpu.init import create_model
    from haloop_tpu.checkpoint import save_checkpoint

    spec = create_model("lstm:512")
    params = spec.init(jax.random.PRNGKey(0))
    native = tmp_path / "hac.pt"
    save_checkpoint(native, {"encoder": params["encoder"],
                             "recognizer": params["recognizer"],
                             "optimizer": None, "loop_args": {}})
    subprocess.run([sys.executable, "-m", "haloop_tpu.export",
                    str(native), str(tmp_path / "out.pt")], check=True,
                   cwd=REPO,
                   env={"PATH": "/usr/bin:/bin", "JAX_PLATFORMS": "cpu",
                        "PALLAS_AXON_POOL_IPS": "", "HOME": "/root"})

    enc_sd = torch.load(tmp_path / "out.encoder.pt", weights_only=True)
    enc = ha_rnn.Encoder(input_dim=80, hidden_dim=1536)
    enc.load_state_dict(enc_sd, strict=True)
    rec_sd = torch.load(tmp_path / "out.recognizer.pt", weights_only=True)
    rec = ha_recognizer.TemporalClassifier(feat_dim=1536, vocab_size=512)
    rec.load_state_dict(rec_sd, strict=True)


def test_hal_export_decoder_parity(tmp_path):
    """hal checkpoint -> torch .pt -> strict load into the reference
    ha.rnn.Decoder (tied out_layer.weight, independent bias) -> logits
    parity with our decoder_apply."""
    torch = pytest.importorskip("torch")
    from conftest import reference_module
    ha_rnn = reference_module("ha.rnn")
    from haloop_tpu.models import rnn as R
    from haloop_tpu.checkpoint import save_checkpoint

    V, H, L = 37, 24, 2
    params = R.decoder_init(jax.random.PRNGKey(7), V, H, H, L)
    native = tmp_path / "hal.pt"
    save_checkpoint(native, {"model": params, "vocab": {"kind": "bytes"},
                             "step": 11, "args": {"num_layers": L,
                                                  "rnn_size": H}})
    out = tmp_path / "hal_ref.pt"
    subprocess.run([sys.executable, "-m", "haloop_tpu.export",
                    str(native), str(out)], check=True, cwd=REPO,
                   env={"PATH": "/usr/bin:/bin", "JAX_PLATFORMS": "cpu",
                        "PALLAS_AXON_POOL_IPS": "", "HOME": "/root"})

    ckpt = torch.load(out, weights_only=True)
    assert ckpt["step"] == 11
    # tied entries share one storage
    assert ckpt["model"]["out_layer.weight"].data_ptr() == \
        ckpt["model"]["embedding.weight"].data_ptr()
    tdec = ha_rnn.Decoder(V, H, H, L).eval()
    tdec.load_state_dict(ckpt["model"], strict=True)

    ids = np.array([[3, 1, 4, 1, 5]], dtype=np.int64)  # (N=1, T=5)
    with torch.no_grad():
        tout, _ = tdec.forward_batch_first(torch.tensor(ids),
                                           tdec.init_hidden(1))
    state = R.decoder_init_hidden(L, 1, H)
    jout, _ = R.decoder_apply(
        jax.tree.map(lambda x: x.astype(jnp.float32), params),
        jnp.asarray(ids), state, num_layers=L, batch_first=True)
    np.testing.assert_allclose(np.asarray(jout), tout.numpy(),
                               rtol=2e-5, atol=2e-5)

    # and the reference-written file loads straight back into hal's
    # nested pytree (flat-name ingestion)
    back = R.decoder_params_from_state_dict(ckpt["model"])
    np.testing.assert_array_equal(np.asarray(back["out_layer"]["bias"]),
                                  np.asarray(params["out_layer"]["bias"]))


def test_gpt_export_loads_in_reference_model(tmp_path):
    """Full migration loop: our trained-from-init GPT params -> export
    CLI -> torch.load -> reference GPT.load_state_dict(strict) ->
    logits parity with our forward."""
    torch = pytest.importorskip("torch")
    from conftest import reference_module
    ha_attention = reference_module("ha.attention")
    from haloop_tpu.models import gpt as G
    from haloop_tpu.checkpoint import save_checkpoint

    cfg = G.GPTConfig(block_size=16, vocab_size=97, n_layer=2, n_head=2,
                      n_embd=16, dropout=0.0, bias=True,
                      stable_embedding=True)
    params = G.gpt_init(jax.random.PRNGKey(3), cfg)
    # perturb wpe so the wpe-norm path is exercised (zero-init hides it)
    params["transformer"]["wpe"]["weight"] = \
        jax.random.normal(jax.random.PRNGKey(4), (16, 16)) * 0.3
    native = tmp_path / "native.pt"
    save_checkpoint(native, {"model": params,
                             "model_args": cfg.state_dict(),
                             "iter_num": 5, "val_loss": 1.25})

    out = tmp_path / "exported.pt"
    subprocess.run([sys.executable, "-m", "haloop_tpu.export",
                    str(native), str(out)], check=True, cwd=REPO,
                   env={"PATH": "/usr/bin:/bin", "JAX_PLATFORMS": "cpu",
                        "PALLAS_AXON_POOL_IPS": "", "HOME": "/root"})

    ckpt = torch.load(out, weights_only=False)
    assert ckpt["iter_num"] == 5 and ckpt["val_loss"] == pytest.approx(1.25)

    class Cfg:
        pass
    for k, v in ckpt["model_args"].items():
        setattr(Cfg, k, v)
    tmodel = ha_attention.GPT(Cfg()).eval()
    tmodel.load_state_dict(ckpt["model"], strict=True)

    ids = np.array([[1, 5, 9, 2]], dtype=np.int64)
    with torch.no_grad():
        tlogits, _ = tmodel(torch.tensor(ids))
    x, _, _ = G._trunk(params, cfg, jnp.array(ids))
    jlogits = G.lm_logits(params, x)[:, -1:, :]
    np.testing.assert_allclose(np.asarray(jlogits), tlogits.numpy(),
                               rtol=3e-4, atol=3e-4)


def test_save_pt_rejects_unsupported_dtype(tmp_path):
    """Arrays torch has no storage class for must fail at SAVE time,
    not as an UnpicklingError at torch.load(weights_only=True)."""
    import pytest
    from haloop_tpu.pt_saver import save_pt
    with pytest.raises(TypeError, match="uint32"):
        save_pt(tmp_path / "bad.pt",
                {"rng": np.zeros((2,), dtype=np.uint32)})
