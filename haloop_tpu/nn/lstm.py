"""Multi-layer LSTM via ``lax.scan`` with MXU-friendly batched input matmuls.

TPU design (no cuDNN; reference relies on it at ha/rnn.py:11,39): the
input projection ``x @ W_ih^T`` for ALL timesteps is computed as one
large matmul per layer (T*B rows -> MXU saturation); the sequential scan
then only carries the small ``h @ W_hh^T`` recurrence. Torch gate order
(i, f, g, o) and parameter naming (``weight_ih_l{k}`` ...) are kept so
reference checkpoints map 1:1.
"""

import math

import jax
import jax.numpy as jnp

from haloop_tpu.nn.core import dropout as dropout_fn, uniform_init


def lstm_init(key, input_size, hidden_size, num_layers=1):
    p = {}
    bound = 1.0 / math.sqrt(hidden_size)
    for layer in range(num_layers):
        in_size = input_size if layer == 0 else hidden_size
        keys = jax.random.split(jax.random.fold_in(key, layer), 4)
        p[f"weight_ih_l{layer}"] = uniform_init(keys[0], (4 * hidden_size, in_size), bound)
        p[f"weight_hh_l{layer}"] = uniform_init(keys[1], (4 * hidden_size, hidden_size), bound)
        p[f"bias_ih_l{layer}"] = uniform_init(keys[2], (4 * hidden_size,), bound)
        p[f"bias_hh_l{layer}"] = uniform_init(keys[3], (4 * hidden_size,), bound)
    return p


def lstm_cell(x_proj, h, c, w_hh):
    """One step given the precomputed input projection (B, 4H)."""
    gates = x_proj + h @ w_hh.T
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    i = jax.nn.sigmoid(i)
    f = jax.nn.sigmoid(f)
    g = jnp.tanh(g)
    o = jax.nn.sigmoid(o)
    c = f * c + i * g
    h = o * jnp.tanh(c)
    return h, c


def use_q8():
    """Opt-in int8-resident recurrence (nn/lstm_pallas.py quant mode):
    HALOOP_RNN_Q8=1 (hac --rnn-q8 sets it). Changes numerics
    (~bf16-level noise), so it is never auto-enabled."""
    import os
    return os.environ.get("HALOOP_RNN_Q8") == "1"


# largest W_hh (bytes, in the layer's compute dtype) the resident-weight
# kernel may claim; the rest of the raised scoped-VMEM budget goes to the
# streamed x_proj/dgates blocks. 72 MB admits fp32 H=2048 (the hal RNN-LM:
# measured fwd 1.2x, grad 2.2x over the fp32 scan)
_RESIDENT_LIMIT = 72 * 1024 * 1024


def _single_layer(p, layer, x, h0, c0):
    """x: (T, B, in) -> (T, B, H). One big input matmul, then the
    recurrence: VMEM-resident Pallas kernel on TPU (bf16 weights, or
    int8 under HALOOP_RNN_Q8), lax.scan elsewhere."""
    w_ih = p[f"weight_ih_l{layer}"].astype(x.dtype)
    bias = (p[f"bias_ih_l{layer}"] + p[f"bias_hh_l{layer}"]).astype(x.dtype)
    x_proj = x @ w_ih.T + bias          # (T, B, 4H): the MXU-heavy part
    w_hh = p[f"weight_hh_l{layer}"]
    import os
    # budget against the dtype the kernel actually holds resident:
    # int8 (1 byte) under HALOOP_RNN_Q8, else the layer's compute dtype
    # (x.dtype) — NOT the fp32 master dtype, which would wrongly
    # disqualify exactly the large hidden sizes q8 mode exists for
    resident_itemsize = 1 if use_q8() else jnp.dtype(x.dtype).itemsize
    wbytes = resident_itemsize * w_hh.size
    override = os.environ.get("HALOOP_LSTM_KERNEL")  # pin independently
    if override in ("0", "1"):
        eligible = override == "1"
    else:
        # same multi-device gate as every other kernel (GSPMD has no
        # partitioning rules for pallas_call; shard_map bodies mark the
        # trace with force_local), plus the VMEM residency budget
        from haloop_tpu.ops.dispatch import use_pallas
        eligible = use_pallas() and wbytes <= _RESIDENT_LIMIT
    if use_q8() and eligible:
        from haloop_tpu.nn.lstm_pallas import lstm_scan_pallas
        ys, h, c = lstm_scan_pallas(w_hh, x_proj, h0, c0, True)
    elif eligible:
        # the kernel computes in the layer's compute dtype (x.dtype):
        # bf16 paths keep bf16 speed, fp32 paths keep fp32 precision
        from haloop_tpu.nn.lstm_pallas import lstm_scan_pallas
        ys, h, c = lstm_scan_pallas(w_hh.astype(x.dtype), x_proj, h0, c0,
                                    False)
    else:
        ys, h, c = lstm_scan(w_hh.astype(x.dtype), x_proj, h0, c0)
    return ys, h, c


_UNROLL = 1


# ---------------------------------------------------------------------
# Recurrent core with a hand-written backward.
#
# Why: autodiff of the scan accumulates dW_hh with one rank-B update per
# timestep — reading AND writing the (H, 4H) fp32 accumulator every step
# (~66 GB of HBM traffic for the lstm:512 bench config, dominating the
# train step). This custom VJP instead: (1) recomputes all gates with
# ONE matmul over the stacked h_{t-1}, (2) runs only the tiny dh/dc
# chain sequentially, stacking per-step gate deltas, and (3) forms
# dW_hh/dx_proj with single big MXU matmuls. Measured ~2x end-to-end on
# the hac lstm:512 bench (PERFORMANCE.md).


@jax.custom_vjp
def lstm_scan(w_hh, x_proj, h0, c0):
    (h, c), ys = _forward_scan(w_hh, x_proj, h0, c0)
    return ys, h, c


def _forward_scan(w_hh, x_proj, h0, c0):
    def step(carry, xp):
        h, c = carry
        h, c = lstm_cell(xp, h, c, w_hh)
        return (h, c), h

    return jax.lax.scan(step, (h0, c0), x_proj, unroll=_UNROLL)


def _lstm_scan_fwd(w_hh, x_proj, h0, c0):
    (h, c), ys = _forward_scan(w_hh, x_proj, h0, c0)
    # residuals: hidden states (needed anyway); cells recomputed cheaply
    return (ys, h, c), (w_hh, x_proj, h0, c0, ys)


def _lstm_scan_bwd(res, grads):
    w_hh, x_proj, h0, c0, ys = res
    dys, dh_last, dc_last = grads
    T, B, H = ys.shape

    h_prev = jnp.concatenate([h0[None], ys[:-1]], axis=0)      # (T, B, H)
    # all gate pre-activations in ONE matmul (reads w_hh once)
    gates = x_proj + h_prev @ w_hh.T                           # (T, B, 4H)
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    i = jax.nn.sigmoid(i)
    f = jax.nn.sigmoid(f)
    g = jnp.tanh(g)
    o = jax.nn.sigmoid(o)

    # recompute the cell chain (sequential but elementwise-only)
    def cell_step(c, ifg):
        i_t, f_t, g_t = ifg
        c = f_t * c + i_t * g_t
        return c, c

    _, cs = jax.lax.scan(cell_step, c0, (i, f, g))
    c_prev = jnp.concatenate([c0[None], cs[:-1]], axis=0)
    tanh_c = jnp.tanh(cs)

    def back_step(carry, inp):
        dh, dc = carry
        dy, i_t, f_t, g_t, o_t, cp, tc = inp
        dh = dh + dy
        do = dh * tc * o_t * (1 - o_t)
        dc = dc + dh * o_t * (1 - tc * tc)
        di = dc * g_t * i_t * (1 - i_t)
        dfg = dc * cp * f_t * (1 - f_t)
        dg = dc * i_t * (1 - g_t * g_t)
        dgates = jnp.concatenate([di, dfg, dg, do], axis=-1)   # (B, 4H)
        dh_prev = dgates @ w_hh                                 # (B, H)
        dc_prev = dc * f_t
        return (dh_prev, dc_prev), dgates

    (dh0, dc0), dgates = jax.lax.scan(
        back_step, (dh_last, dc_last),
        (dys, i, f, g, o, c_prev, tanh_c), reverse=True)

    # weight/input grads as single large matmuls over the stacked axis
    dg2 = dgates.reshape(T * B, 4 * H)
    hp2 = h_prev.reshape(T * B, H)
    dw_hh = (dg2.T @ hp2).astype(w_hh.dtype)                    # (4H, H)
    dx_proj = dgates
    return dw_hh, dx_proj, dh0, dc0


lstm_scan.defvjp(_lstm_scan_fwd, _lstm_scan_bwd)


def multilayer_lstm(p, x, state=None, num_layers=1, hidden_size=None,
                    dropout=0.0, dropout_key=None, deterministic=True):
    """Full stack. x: (T, B, in); state: (h, c) each (L, B, H) or None.

    Returns (output (T, B, H), (h, c)). Inter-layer dropout matches torch
    semantics (applied to all but the last layer's output).
    """
    T, B = x.shape[0], x.shape[1]
    if hidden_size is None:
        hidden_size = p["weight_hh_l0"].shape[1]
    if state is None:
        h0 = jnp.zeros((num_layers, B, hidden_size), x.dtype)
        c0 = jnp.zeros((num_layers, B, hidden_size), x.dtype)
    else:
        h0, c0 = state
        h0 = h0.astype(x.dtype)
        c0 = c0.astype(x.dtype)

    hs, cs = [], []
    out = x
    for layer in range(num_layers):
        out, h, c = _single_layer(p, layer, out, h0[layer], c0[layer])
        hs.append(h)
        cs.append(c)
        if dropout > 0.0 and layer < num_layers - 1 and not deterministic \
                and dropout_key is not None:
            # keyless train calls no-op, like dropout_fn itself
            out = dropout_fn(jax.random.fold_in(dropout_key, layer), out,
                             dropout, deterministic)
    return out, (jnp.stack(hs), jnp.stack(cs))


def lstm(p, x, state=None, **kw):
    return multilayer_lstm(p, x, state, **kw)
