import numpy as np
import pytest
import jax
import jax.numpy as jnp

from haloop_tpu.models import gpt as G
from haloop_tpu.models import transformer as TR
from haloop_tpu.models import rnn as R
from haloop_tpu.models import recognizer as RE
from haloop_tpu.models import audio as AU


def test_gpt_forward_all_and_incremental_parity():
    cfg = G.GPTConfig(block_size=32, vocab_size=17, n_layer=2, n_head=2,
                      n_embd=16, causal=True)
    p = G.gpt_init(jax.random.PRNGKey(0), cfg)
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 7), 1, 17)

    # full pass last-token logits
    x, _, _ = G._trunk(p, cfg, ids)
    full_logits = G.lm_logits(p, x)[:, -1, :]

    # incremental pass with fixed-size KV cache
    cache = G.init_cache(cfg, 2, size=16)
    for t in range(7):
        logits, cache = G.forward(p, cfg, ids[:, t:t + 1], past=cache)
    np.testing.assert_allclose(np.asarray(logits[:, 0]),
                               np.asarray(full_logits), rtol=2e-4, atol=2e-4)


def test_gpt_rotary_incremental_parity():
    cfg = G.GPTConfig(block_size=32, vocab_size=17, n_layer=2, n_head=2,
                      n_embd=16, causal=True, rotary_emb_dim=8)
    p = G.gpt_init(jax.random.PRNGKey(0), cfg)
    ids = jax.random.randint(jax.random.PRNGKey(1), (1, 5), 1, 17)
    x, _, _ = G._trunk(p, cfg, ids)
    full_logits = G.lm_logits(p, x)[:, -1, :]
    cache = G.init_cache(cfg, 1, size=8)
    logits, cache = G.forward(p, cfg, ids[:, :3], past=cache)
    for t in range(3, 5):
        logits, cache = G.forward(p, cfg, ids[:, t:t + 1], past=cache)
    np.testing.assert_allclose(np.asarray(logits[:, 0]),
                               np.asarray(full_logits), rtol=2e-4, atol=2e-4)


def test_gpt_loss_and_grad():
    cfg = G.GPTConfig(block_size=16, vocab_size=13, n_layer=1, n_head=2,
                      n_embd=8)
    p = G.gpt_init(jax.random.PRNGKey(0), cfg)
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 6), 1, 13)
    tgt = jnp.roll(ids, -1, axis=1).at[:, -1].set(0)

    def loss(p):
        return G.forward_all(p, cfg, ids, tgt)

    val, grads = jax.value_and_grad(loss)(p)
    assert np.isfinite(float(val))
    flat = jax.tree.leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
    # tied embedding must receive gradient
    assert np.abs(np.asarray(grads["lm_head"]["weight"])).sum() > 0


def test_gpt_generate_stops():
    cfg = G.GPTConfig(block_size=32, vocab_size=11, n_layer=1, n_head=2,
                      n_embd=8)
    p = G.gpt_init(jax.random.PRNGKey(0), cfg)
    ids = jnp.array([[5, 6]])
    # no stop token: every emitted position stays alive
    toks, alive = G.generate(p, cfg, ids, 8, top_k=1, stop_token=-1)
    assert toks.shape == (1, 8)
    assert np.asarray(alive).all()
    # make the FIRST greedy token the stop token: everything after it
    # must be masked out (and the run is deterministic, so the
    # remaining prefix matches the unstopped run)
    stop = int(np.asarray(toks)[0, 0])
    toks2, alive2 = G.generate(p, cfg, ids, 8, top_k=1, stop_token=stop)
    a2 = np.asarray(alive2)[0]
    assert not a2[1:].any(), a2
    np.testing.assert_array_equal(np.asarray(toks2)[0, 0],
                                  np.asarray(toks)[0, 0])


def test_cache_len_for():
    """KV capacity sizing (r5 decode right-sizing): 128-aligned,
    floored at 128, capped at block_size, speculative headroom via
    `extra` — capacity sets decode bandwidth, so these edges are the
    difference between +23% tok/s and an OOB cache write."""
    cfg = G.GPTConfig(block_size=1024, vocab_size=64, n_layer=1,
                      n_head=2, n_embd=8)
    assert G.cache_len_for(cfg, 32, 12) == 128          # floor
    assert G.cache_len_for(cfg, 32, 128) == 256         # round up
    assert G.cache_len_for(cfg, 128, 128) == 256        # exact multiple
    assert G.cache_len_for(cfg, 32, 128, extra=100) == 384
    assert G.cache_len_for(cfg, 1000, 500) == 1024      # block_size cap
    # generations sized by it never write past capacity: tiny model,
    # horizon exactly at a bucket edge
    small = G.GPTConfig(block_size=64, vocab_size=11, n_layer=1,
                        n_head=2, n_embd=8)
    p = G.gpt_init(jax.random.PRNGKey(0), small)
    ids = jnp.array([[5, 6, 7]])
    toks, _ = G.generate(p, small, ids, 32, top_k=1, stop_token=-1)
    assert toks.shape == (1, 32)


def _tiny_cfg():
    return TR.TransformerConfig(vocab=16, head_dim=8, heads=2, p_drop=0.0,
                                layers=2)


def test_decoder_forward_loss():
    cfg = _tiny_cfg()
    p = TR.decoder_init(jax.random.PRNGKey(0), cfg)
    N, S, U = 2, 10, 4
    feats = jax.random.normal(jax.random.PRNGKey(1), (N, S, 16))
    targets = jax.random.randint(jax.random.PRNGKey(2), (N, U), 4, 16)
    il = jnp.array([10, 7]); tl = jnp.array([4, 2])
    loss, stats = TR.decoder_forward(p, cfg, feats, targets, il, tl,
                                     train=False)
    assert np.isfinite(float(loss))
    # sumeach mode gives per-utterance scores
    score, _ = TR.decoder_forward(p, cfg, feats, targets, il, tl,
                                  reduction="sumeach", train=False)
    assert score.shape == (N,)


def test_decoder_decode_matches_full_forward():
    """Cache-based stepwise decode must reproduce the tokens a full
    teacher-forced causal pass would pick (cache correctness oracle)."""
    cfg = _tiny_cfg()
    p = TR.decoder_init(jax.random.PRNGKey(0), cfg)
    N, S = 2, 9
    feats = jax.random.normal(jax.random.PRNGKey(1), (N, S, 16))
    il = jnp.array([9, 6]); tl = jnp.array([5, 5])

    hyp, out_len, log_probs, sum_ent = TR.decoder_decode(
        p, cfg, feats, il, tl, max_steps=5)
    assert hyp.shape[0] == N

    # teacher-force [STX, hyp...] through the full causal pass
    steps = int(np.asarray(out_len).min())
    buf = jnp.pad(hyp[:, :steps - 1], ((0, 0), (1, 0)), constant_values=TR.STX)
    y = jax.vmap(lambda ids: p["wte"]["weight"][ids])(buf)
    for block in p["h"]:
        y, _ = TR.block_apply(block, y, heads=cfg.heads, causal=True,
                              memory=feats, memory_lengths=il, train=False)
    from haloop_tpu.nn.core import layer_norm, linear
    logits = linear(p["lm_head"], layer_norm(p["ln_f"], y))
    greedy = np.asarray(jnp.argmax(logits, axis=-1))

    # input position t holds buf[t] and predicts hyp[t]
    want = np.asarray(hyp)
    for n in range(N):
        L = int(np.asarray(out_len)[n])
        upto = min(L - 1, steps - 1)
        np.testing.assert_array_equal(greedy[n, :upto], want[n, :upto])


def test_ctc_attention_decoder():
    cfg = _tiny_cfg()
    p = TR.ctc_attention_decoder_init(jax.random.PRNGKey(0), cfg)
    N, S, U = 2, 12, 3
    feats = jax.random.normal(jax.random.PRNGKey(1), (N, S, 16))
    cond = jax.random.randint(jax.random.PRNGKey(2), (N, U + 1), 4, 16)
    il = jnp.array([12, 10]); cl = jnp.array([4, 3])
    loss, stats = TR.ctc_attention_decoder_forward(
        p, cfg, feats, cond, il, cl, train=False)
    assert np.isfinite(float(loss))

    def f(p):
        l, _ = TR.ctc_attention_decoder_forward(p, cfg, feats, cond, il, cl,
                                                train=False)
        return l
    g = jax.grad(f)(p)
    assert all(np.isfinite(np.asarray(x)).all() for x in jax.tree.leaves(g))


def test_rnn_encoder_shapes():
    p = R.encoder_init(jax.random.PRNGKey(0), input_dim=13, subsample_dim=8,
                       hidden_dim=16, num_layers=2)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 37, 13))
    feats, lens, _ = R.encoder_apply(p, x, jnp.array([37, 20]), num_layers=2)
    assert feats.shape[0] == 2 and feats.shape[2] == 16
    # conv arithmetic: floor((37 + 6 - 5)/4 + 1) = 10
    assert int(lens[0]) == 10


def test_temporal_classifier_roundtrip():
    p = RE.temporal_classifier_init(jax.random.PRNGKey(0), 16, 8)
    feats = jax.random.normal(jax.random.PRNGKey(1), (2, 20, 16))
    tg = jnp.array([[1, 2, 3], [4, 5, 0]])
    loss, _ = RE.temporal_classifier_loss(p, feats, tg, jnp.array([20, 15]),
                                          jnp.array([3, 2]))
    assert np.isfinite(float(loss))
    hyps, lens, ali, scores, sum_ent = RE.temporal_classifier_decode(
        p, feats, jnp.array([20, 15]))
    assert hyps.shape[0] == 2
    # entropy sums are negative (sign convention of transformer.py:311)
    # and bounded by len * log2(vocab)
    assert np.all(np.asarray(sum_ent) <= 0)
    assert np.all(np.asarray(sum_ent) >= -np.array([20, 15]) * np.log2(8))


def test_ctc_collapse():
    ali = jnp.array([[0, 2, 2, 0, 3, 3, 1, 0]])
    hyps, lens = RE.ctc_collapse(ali, jnp.array([8]))
    assert int(lens[0]) == 3
    np.testing.assert_array_equal(np.asarray(hyps[0, :3]), [2, 3, 1])
    # length masking drops the tail
    hyps, lens = RE.ctc_collapse(ali, jnp.array([4]))
    assert int(lens[0]) == 1
    assert int(hyps[0, 0]) == 2


def test_transducer_loss():
    p = RE.transducer_init(jax.random.PRNGKey(0), feat_dim=16, vocab_size=8,
                           lm_dim=8, lm_layers=1)
    feats = jax.random.normal(jax.random.PRNGKey(1), (2, 12, 16))
    tg = jnp.array([[1, 2, 3], [4, 5, 0]])
    loss, _ = RE.transducer_loss(p, feats, tg, jnp.array([12, 9]),
                                 jnp.array([3, 2]), lm_layers=1, lm_dim=8)
    assert np.isfinite(float(loss))


def test_audio_encoders():
    cfg = AU.AudioEncoderConfig(block_size=64, n_layer=1, n_head=2, n_embd=16,
                                d_input=13, rotary_emb_dim=8)
    p = AU.audio_encoder_init(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 13))
    feats, lens, _ = AU.audio_encoder_apply(p, cfg, x, jnp.array([32, 20]))
    assert feats.shape == (2, 16, 16)

    scfg = AU.StridingAudioEncoderConfig(
        block_size=64, n_layer=1, n_head=2, n_embd=16, d_input=13,
        rotary_emb_dim=8, d_conv=8, conv_strides=(2, 2))
    sp = AU.striding_audio_encoder_init(jax.random.PRNGKey(0), scfg)
    feats, lens, _ = AU.striding_audio_encoder_apply(
        sp, scfg, x, jnp.array([32, 20]))
    assert feats.shape[0] == 2 and feats.shape[2] == 16


def test_lstm_matches_torch():
    """Oracle: our scan LSTM against torch.nn.LSTM with transplanted
    weights (values parity)."""
    torch = pytest.importorskip("torch")
    from haloop_tpu.nn.lstm import lstm_init, multilayer_lstm
    key = jax.random.PRNGKey(0)
    p = lstm_init(key, 6, 10, num_layers=2)

    tl = torch.nn.LSTM(6, 10, num_layers=2)
    with torch.no_grad():
        for name, t in tl.named_parameters():
            t.copy_(torch.tensor(np.asarray(p[name])))

    x = np.random.default_rng(0).normal(size=(7, 3, 6)).astype(np.float32)
    got, (h, c) = multilayer_lstm(p, jnp.array(x), num_layers=2)
    want, (th, tc) = tl(torch.tensor(x))
    np.testing.assert_allclose(np.asarray(got), want.detach().numpy(),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(h), th.detach().numpy(),
                               rtol=1e-4, atol=1e-4)
