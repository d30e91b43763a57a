"""VMEM-resident LSTM kernels (nn/lstm_pallas.py) vs exact oracles.

bf16 mode: parity with the exact lax.scan recurrence (same math, bf16
recurrent matmul) for values and grads.
q8 mode: forward matches a pure-jax mirror of the int8 arithmetic;
grads track a straight-through oracle.
"""

import numpy as np
import jax
import jax.numpy as jnp

from haloop_tpu.nn.lstm import lstm_scan
from haloop_tpu.nn import lstm_pallas as Q


def q8_oracle(w_hh, x_proj, h0, c0):
    """Pure-jax mirror of the quantized kernel's arithmetic."""
    wq, s = Q.quantize_rows(w_hh)
    sdiv = (s / 127.0).astype(jnp.float32)

    def step(carry, xp):
        h, c = carry
        hq = jnp.clip(jnp.round(h * 127.0), -127, 127)
        acc = hq @ wq.astype(jnp.float32).T
        gates = xp.astype(jnp.float32) + acc * sdiv[None, :]
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h = jax.nn.sigmoid(o) * jnp.tanh(c)
        return (h, c), h

    (h, c), ys = jax.lax.scan(
        step, (h0.astype(jnp.float32), c0.astype(jnp.float32)), x_proj)
    return ys.astype(x_proj.dtype), h, c


def _data(T=12, B=3, H=64, seed=0):
    rng = np.random.default_rng(seed)
    w = jnp.asarray(rng.normal(size=(4 * H, H)).astype(np.float32) * 0.3)
    xp = jnp.asarray(rng.normal(size=(T, B, 4 * H)).astype(np.float32))
    h0 = jnp.zeros((B, H), jnp.float32)
    c0 = jnp.zeros((B, H), jnp.float32)
    return w, xp, h0, c0


# ------------------------------------------------------------ bf16 mode

def test_bf16_fwd_matches_scan():
    w, xp, h0, c0 = _data(T=15, B=4, H=128, seed=4)
    ys, h, c = Q.lstm_scan_pallas(w, xp, h0, c0, False)
    ye, he, ce = lstm_scan(w, xp, h0, c0)
    # kernel uses a bf16 recurrent matmul with fp32 gate math; the scan
    # here is all-fp32 -> differences are bf16-rounding sized
    np.testing.assert_allclose(np.asarray(ys), np.asarray(ye),
                               atol=2e-2, rtol=2e-2)
    err = np.abs(np.asarray(ys) - np.asarray(ye)).mean()
    assert err < 2e-3, err


def test_bf16_unaligned_shapes():
    w, xp, h0, c0 = _data(T=7, B=5, H=40, seed=3)
    ys, h, c = Q.lstm_scan_pallas(w, xp, h0, c0, False)
    ye, he, ce = lstm_scan(w, xp, h0, c0)
    np.testing.assert_allclose(np.asarray(ys), np.asarray(ye),
                               atol=2e-2, rtol=2e-2)


def test_bf16_grads_match_scan():
    w, xp, h0, c0 = _data(T=10, B=3, H=64, seed=2)

    def loss(fn):
        def inner(w, xp):
            ys, h, c = fn(w, xp)
            t = jnp.arange(ys.size, dtype=ys.dtype).reshape(ys.shape)
            return jnp.sum(ys * jnp.sin(t * 0.01))
        return inner

    gw, gx = jax.grad(loss(
        lambda w, xp: Q.lstm_scan_pallas(w, xp, h0, c0, False)),
        (0, 1))(w, xp)
    gw2, gx2 = jax.grad(loss(
        lambda w, xp: lstm_scan(w, xp, h0, c0)), (0, 1))(w, xp)

    def cos(a, b):
        a, b = np.asarray(a).ravel(), np.asarray(b).ravel()
        return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))

    assert cos(gw, gw2) > 0.9995, cos(gw, gw2)
    assert cos(gx, gx2) > 0.9995, cos(gx, gx2)


# -------------------------------------------------------------- q8 mode

def test_q8_fwd_matches_oracle():
    w, xp, h0, c0 = _data()
    ys, h, c = Q.lstm_scan_q8(w, xp, h0, c0)
    ys2, h2, c2 = q8_oracle(w, xp, h0, c0)
    np.testing.assert_allclose(np.asarray(ys), np.asarray(ys2),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(c), np.asarray(c2), atol=1e-5)


def test_q8_fwd_unaligned_shapes():
    w, xp, h0, c0 = _data(T=7, B=5, H=40, seed=3)
    ys, h, c = Q.lstm_scan_q8(w, xp, h0, c0)
    ys2, h2, c2 = q8_oracle(w, xp, h0, c0)
    np.testing.assert_allclose(np.asarray(ys), np.asarray(ys2),
                               atol=1e-5, rtol=1e-5)


def test_q8_fwd_close_to_exact():
    w, xp, h0, c0 = _data(T=20, B=4, H=128, seed=1)
    ys, _, _ = Q.lstm_scan_q8(w, xp, h0, c0)
    ye, _, _ = lstm_scan(w, xp, h0, c0)
    err = np.abs(np.asarray(ys) - np.asarray(ye))
    scale = np.abs(np.asarray(ye)).mean() + 1e-9
    assert err.mean() / scale < 0.02, err.mean() / scale


def test_q8_grads_track_oracle():
    w, xp, h0, c0 = _data(T=10, B=3, H=64, seed=2)

    def loss_kernel(w, xp):
        ys, h, c = Q.lstm_scan_q8(w, xp, h0, c0)
        t = jnp.arange(ys.size, dtype=ys.dtype).reshape(ys.shape)
        return jnp.sum(ys * jnp.sin(t * 0.01))

    def ste_round(x):
        return x + jax.lax.stop_gradient(jnp.clip(jnp.round(x), -127, 127)
                                         - x)

    def loss_oracle_ste(w, xp):
        wq, s = Q.quantize_rows(w)
        w_deq = jax.lax.stop_gradient(wq.astype(jnp.float32) * s[:, None])
        w_st = w + jax.lax.stop_gradient(w_deq - w)

        def step(carry, xpt):
            h, c = carry
            hq = ste_round(h * 127.0) / 127.0
            gates = xpt.astype(jnp.float32) + hq @ w_st.T
            i, f, g, o = jnp.split(gates, 4, axis=-1)
            c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
            h = jax.nn.sigmoid(o) * jnp.tanh(c)
            return (h, c), h

        (h, c), ys = jax.lax.scan(
            step, (h0.astype(jnp.float32), c0.astype(jnp.float32)), xp)
        t = jnp.arange(ys.size, dtype=ys.dtype).reshape(ys.shape)
        return jnp.sum(ys * jnp.sin(t * 0.01))

    gw, gx = jax.grad(loss_kernel, (0, 1))(w, xp)
    gw2, gx2 = jax.grad(loss_oracle_ste, (0, 1))(w, xp)

    def cos(a, b):
        a, b = np.asarray(a).ravel(), np.asarray(b).ravel()
        return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))

    assert cos(gw, gw2) > 0.999, cos(gw, gw2)
    assert cos(gx, gx2) > 0.999, cos(gx, gx2)


def test_multilayer_dispatch(monkeypatch):
    from haloop_tpu.nn.lstm import multilayer_lstm, lstm_init
    # q8 needs BOTH the opt-in and kernel eligibility (on CPU the
    # latter comes from the explicit pin; without it q8 must fall back
    # to the exact scan — the multi-device safety property)
    monkeypatch.setenv("HALOOP_RNN_Q8", "1")
    monkeypatch.setenv("HALOOP_LSTM_KERNEL", "1")
    p = lstm_init(jax.random.PRNGKey(0), 32, 64, num_layers=2)
    x = jax.random.normal(jax.random.PRNGKey(1), (9, 2, 32))
    out, (h, c) = multilayer_lstm(p, x, num_layers=2)
    monkeypatch.delenv("HALOOP_LSTM_KERNEL")
    out_fallback, _ = multilayer_lstm(p, x, num_layers=2)
    monkeypatch.delenv("HALOOP_RNN_Q8")
    out2, _ = multilayer_lstm(p, x, num_layers=2)
    rel = float(jnp.mean(jnp.abs(out - out2)) /
                (jnp.mean(jnp.abs(out2)) + 1e-9))
    assert out.shape == out2.shape
    assert 1e-9 < rel < 0.05, rel       # q8 ran: close but not identical
    # ineligible (CPU, no pin): exact scan regardless of the q8 opt-in
    np.testing.assert_array_equal(np.asarray(out_fallback),
                                  np.asarray(out2))


def test_q8_training_converges():
    """A tiny LSTM regression trained through the q8 straight-through
    path reaches (near-)zero loss: quantization noise does not break
    optimization."""
    import optax

    H, B, T = 32, 4, 16
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(T, B, 4 * H)).astype(np.float32))
    target = jnp.asarray(rng.normal(size=(T, B, H)).astype(np.float32)) * .3
    w = jnp.asarray(rng.normal(size=(4 * H, H)).astype(np.float32) * 0.1)
    h0 = c0 = jnp.zeros((B, H), jnp.float32)

    def loss_fn(w):
        ys, _, _ = Q.lstm_scan_q8(w, x, h0, c0)
        return jnp.mean((ys - target) ** 2)

    tx = optax.adam(3e-2)
    opt = tx.init(w)
    step = jax.jit(lambda w, opt: (lambda l, g: (
        optax.apply_updates(w, tx.update(g, opt, w)[0]),
        tx.update(g, opt, w)[1], l))(*jax.value_and_grad(loss_fn)(w)))

    first = None
    for it in range(200):
        w, opt, l = step(w, opt)
        if first is None:
            first = float(l)
    # 0.125 -> ~0.032 over 200 adam steps (random targets are not fully
    # fittable; the point is steady optimization through the STE grads)
    assert float(l) < first * 0.35, (first, float(l))
