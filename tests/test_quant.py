"""Weight-only int8 quantization (haloop_tpu/quant.py; hat/hap --q8).

Mechanism tests are exact: the qscale epilogue in nn.core.linear must
compute the SAME number as a dense matmul against the dequantized
weight, and quantization error itself is bounded by half a step per
weight. Model-level tests bound the end-to-end NLL drift on a tiny
GPT and check the actual decode path (KV cache + generate)."""

import os
import subprocess
import sys

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from haloop_tpu import quant
from haloop_tpu.models import gpt as G
from haloop_tpu.nn.core import embedding, linear


def test_quantize_weight_error_bound():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(64, 48)) * 0.02, jnp.float32)
    q, s = quant.quantize_weight(w)
    assert q.dtype == jnp.int8 and s.shape == (64,)
    err = np.abs(np.asarray(w) - np.asarray(q, np.float32) *
                 np.asarray(s)[:, None])
    # symmetric absmax rounding: at most half a quantization step
    assert (err <= np.asarray(s)[:, None] * 0.5 + 1e-8).all()
    # zero rows quantize to zeros with a benign scale
    q0, s0 = quant.quantize_weight(jnp.zeros((4, 8)))
    assert (np.asarray(q0) == 0).all() and (np.asarray(s0) == 1.0).all()


def test_linear_qscale_epilogue_exact():
    rng = np.random.default_rng(1)
    w = jnp.asarray(rng.normal(size=(32, 24)) * 0.05, jnp.float32)
    b = jnp.asarray(rng.normal(size=(32,)), jnp.float32)
    x = jnp.asarray(rng.normal(size=(5, 24)), jnp.float32)
    q, s = quant.quantize_weight(w)
    got = linear({"weight": q, "qscale": s, "bias": b}, x)
    want = linear({"weight": quant.dequantize({"weight": q, "qscale": s}),
                   "bias": b}, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


def test_embedding_qscale_rows():
    rng = np.random.default_rng(2)
    w = jnp.asarray(rng.normal(size=(16, 8)) * 0.02, jnp.float32)
    q, s = quant.quantize_weight(w)
    ids = jnp.asarray([[0, 3, 15, 7]])
    got = embedding({"weight": q, "qscale": s}, ids)
    want = jnp.take(quant.dequantize({"weight": q, "qscale": s}), ids,
                    axis=0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


def _nano():
    cfg = G.GPTConfig(block_size=32, vocab_size=64, n_layer=2, n_head=2,
                      n_embd=16)
    return cfg, G.gpt_init(jax.random.PRNGKey(0), cfg)


def test_quantize_gpt_params_structure():
    cfg, params = _nano()
    qp = quant.quantize_gpt_params(params)
    assert qp["lm_head"]["weight"].dtype == jnp.int8
    blk = qp["transformer"]["h"][0]
    for leaf in (blk["attn"]["c_attn"], blk["attn"]["c_proj"],
                 blk["mlp"]["c_fc"], blk["mlp"]["c_proj"]):
        assert leaf["weight"].dtype == jnp.int8 and "qscale" in leaf
    # non-matmul leaves untouched
    assert qp["transformer"]["wpe"]["weight"].dtype == jnp.float32
    assert qp["transformer"]["h"][0]["ln_1"]["weight"].dtype == jnp.float32
    # original tree not mutated
    assert params["lm_head"]["weight"].dtype == jnp.float32


def test_quantize_skips_lora_adapters():
    from haloop_tpu.models import lora
    cfg, params = _nano()
    params = lora.attach_to_c_attn(params, jax.random.PRNGKey(7))
    qp = quant.quantize_gpt_params(params)
    c_attn = qp["transformer"]["h"][0]["attn"]["c_attn"]
    assert "qscale" not in c_attn        # lora path reads fp weights
    assert c_attn["lora_A"].dtype == jnp.float32


def test_forward_nll_drift_bounded():
    """End-to-end: per-token NLL under q8 stays within quantization
    noise of the fp32 NLL on a tiny GPT (weights at trained-like
    scale). This bounds accumulated error through 2 blocks + tied
    embedding + logits."""
    cfg, params = _nano()
    qp = quant.quantize_gpt_params(params)
    rng = np.random.default_rng(3)
    ids = jnp.asarray(rng.integers(1, 64, (4, 32)))
    tgt = jnp.asarray(rng.integers(1, 64, (4, 32)))
    nll_fp = np.asarray(G.forward_all(params, cfg, ids, tgt,
                                      reduction="none"))
    nll_q8 = np.asarray(G.forward_all(qp, cfg, ids, tgt,
                                      reduction="none"))
    drift = np.abs(nll_q8 - nll_fp)
    assert drift.mean() < 0.02, drift.mean()
    assert drift.max() < 0.1, drift.max()


def test_q8_kv_cache_decode_matches_q8_teacher_forcing():
    """The hat decode path: q8 forward with a KV cache must produce
    the same logits as the q8 full forward (cache correctness is
    independent of quantization)."""
    cfg, params = _nano()
    qp = quant.quantize_gpt_params(params)
    rng = np.random.default_rng(4)
    ids = jnp.asarray(rng.integers(1, 64, (2, 8)))

    cache = G.init_cache(cfg, 2)
    logits_prefill, cache = G.forward(qp, cfg, ids[:, :7], past=cache)
    logits_step, _ = G.forward(qp, cfg, ids[:, 7:8], past=cache)

    x, _, _ = G._trunk(qp, cfg, ids)
    full = G.lm_logits(qp, x)
    np.testing.assert_allclose(np.asarray(logits_step[:, -1]),
                               np.asarray(full[:, -1]),
                               rtol=2e-4, atol=2e-4)
    toks, valid = G.generate(qp, cfg, ids, max_new_tokens=4)
    assert toks.shape == (2, 4)
    assert (np.asarray(toks) >= 0).all() and (np.asarray(toks) < 64).all()


def test_q8_matmul_kernel():
    """Pallas int8-weight matmul (interpret mode) equals the dequant
    epilogue formula at fp32 accumulation, across decode shapes incl.
    ragged M/N/K padding."""
    from haloop_tpu.ops.q8_matmul import q8_matmul
    rng = np.random.default_rng(5)
    for m, k, n in [(1, 768, 2304), (8, 768, 1024), (16, 384, 768),
                    (3, 100, 300), (16, 1600, 512), (4, 6400, 256)]:
        w = jnp.asarray(rng.normal(size=(n, k)) * 0.02, jnp.float32)
        q, s = quant.quantize_weight(w)
        x = jnp.asarray(rng.normal(size=(m, k)), jnp.float32)
        got = q8_matmul(x, q, s, interpret=True)
        want = (x @ quant.dequantize({"weight": q, "qscale": s}).T)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5), (m, k, n)


def test_linear_dispatches_q8_kernel(monkeypatch):
    """With kernels forced on, nn.core.linear routes decode-sized int8
    matmuls through the Pallas kernel and the result matches the XLA
    epilogue path."""
    monkeypatch.setenv("HALOOP_KERNELS", "1")
    rng = np.random.default_rng(6)
    w = jnp.asarray(rng.normal(size=(256, 128)) * 0.05, jnp.float32)
    q, s = quant.quantize_weight(w)
    x = jnp.asarray(rng.normal(size=(2, 4, 128)), jnp.float32)
    p = {"weight": q, "qscale": s}
    got = linear(p, x)                       # kernel path (M=8 <= 64)
    monkeypatch.setenv("HALOOP_KERNELS", "0")
    want = linear(p, x)                      # XLA epilogue path
    assert got.shape == (2, 4, 256)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_forward_all_q8_keeps_fused_ce(monkeypatch):
    """hap --q8 must not lose the fused lm_head+CE kernel: the
    quantized lm_head is dequantized once at the jit level and the
    fused path produces the same NLLs as the XLA fallback."""
    cfg = G.GPTConfig(block_size=16, vocab_size=4096, n_layer=1,
                      n_head=2, n_embd=128)
    params = G.gpt_init(jax.random.PRNGKey(1), cfg)
    qp = quant.quantize_gpt_params(params)
    rng = np.random.default_rng(7)
    ids = jnp.asarray(rng.integers(1, 4096, (2, 16)))
    tgt = jnp.asarray(rng.integers(1, 4096, (2, 16)))

    monkeypatch.setenv("HALOOP_KERNELS", "1")   # fused CE (interpret)
    fused = np.asarray(G.forward_all(qp, cfg, ids, tgt,
                                     reduction="none"))
    monkeypatch.setenv("HALOOP_KERNELS", "0")   # XLA logsumexp path
    plain = np.asarray(G.forward_all(qp, cfg, ids, tgt,
                                     reduction="none"))
    np.testing.assert_allclose(fused, plain, rtol=1e-4, atol=1e-4)


def run_cli(cmd, **kw):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""
    return subprocess.run(cmd, env=env, capture_output=True, text=True,
                          **kw)


@pytest.fixture(scope="module")
def nano_ckpt(tmp_path_factory):
    exp = tmp_path_factory.mktemp("q8") / "nano"
    r = run_cli([sys.executable, "-m", "haloop_tpu.init",
                 "gpt-nano:300:64", str(exp)])
    assert r.returncode == 0, r.stderr
    return str(exp / "best.pt")


def test_hap_q8_cli(nano_ckpt):
    """hap --q8 end to end: same rows/columns as exact scoring, NLLs
    within quantization drift."""
    lines = "hello world\nquantized scoring should not change much\n"
    exact = run_cli([sys.executable, "-m", "haloop_tpu.score", "--bytes",
                     "--dtype", "float32", nano_ckpt], input=lines)
    q8 = run_cli([sys.executable, "-m", "haloop_tpu.score", "--bytes",
                  "--dtype", "float32", "--q8", nano_ckpt], input=lines)
    assert exact.returncode == 0, exact.stderr
    assert q8.returncode == 0, q8.stderr
    a = [l.split("\t") for l in exact.stdout.strip().split("\n")]
    b = [l.split("\t") for l in q8.stdout.strip().split("\n")]
    assert len(a) == len(b) == 2
    for ra, rb in zip(a, b):
        assert abs(float(ra[0]) - float(rb[0])) < 0.05, (ra, rb)
        assert ra[1:] == rb[1:]                  # token counts identical
