"""LSTM encoder/decoder (reference: ha/rnn.py).

Encoder: Conv1d(k=5, s=4, p=3) subsample -> ReLU -> dropout -> 3-layer
LSTM(1024, inter-layer dropout 0.2) -> ReLU. The LSTM is the scan-based
TPU implementation in nn/lstm.py (one big input matmul per layer).

Decoder: LSTM LM with tied embedding/output weights, seq-first and
batch-first applies, explicit hidden-state carry for TBPTT.
"""

import jax
import jax.numpy as jnp
import numpy as np

from haloop_tpu.nn.core import conv1d, conv1d_init, dropout, embedding, embedding_init
from haloop_tpu.nn.lstm import lstm_init, multilayer_lstm


# ---------------------------------------------------------------- Encoder

def encoder_init(key, input_dim=13, subsample_dim=128, hidden_dim=1024,
                 num_layers=3):
    k1, k2 = jax.random.split(key)
    return {
        "subsample": conv1d_init(k1, input_dim, subsample_dim, 5),
        "lstm": lstm_init(k2, subsample_dim, hidden_dim, num_layers),
    }


def encoder_subsampled_lengths(input_lengths, k=5, s=4, p=3):
    return jnp.floor((input_lengths + 2 * p - k) / s + 1).astype(jnp.int32)


def encoder_apply(p, inputs, input_lengths, *, num_layers=3, p_drop=0.2,
                  lstm_dropout=0.2, key=None, train=False,
                  collect_activations=False):
    """inputs: (N, T, C) -> (features (N, T', H), lengths, stats)."""
    acts = {}
    x = conv1d(p["subsample"], inputs, stride=4, padding=3)
    x = jax.nn.relu(x)
    if collect_activations:
        acts["subsample"] = x
    if train and key is not None:
        kd, key = jax.random.split(key)
        x = dropout(kd, x, p_drop, deterministic=not train)
    x = jnp.swapaxes(x, 0, 1)                       # (T', N, C) for scan
    x, _ = multilayer_lstm(p["lstm"], x, num_layers=num_layers,
                           dropout=lstm_dropout, dropout_key=key,
                           deterministic=not train)
    x = jnp.swapaxes(x, 0, 1)                       # (N, T', H)
    x = jax.nn.relu(x)
    if collect_activations:
        acts["lstm"] = x
    stats = {"activations": acts} if collect_activations else {}
    return x, encoder_subsampled_lengths(input_lengths), stats


# ---------------------------------------------------------------- Decoder

def decoder_init(key, vocab_size, emb_dim, hidden_dim, num_layers):
    k1, k2, k3 = jax.random.split(key, 3)
    bound = 1.0 / float(hidden_dim) ** 0.5
    p = {
        "embedding": embedding_init(k1, vocab_size, emb_dim, std=1.0),
        "rnn": lstm_init(k2, emb_dim, hidden_dim, num_layers),
        # tied: out_layer.weight IS embedding.weight (requires
        # emb_dim == hidden); the BIAS is independent and nonzero —
        # nn.Linear keeps its own bias after the tying assignment
        # (ha/rnn.py:40-42, bias init U(-1/sqrt(H), 1/sqrt(H)))
        "out_layer": {"bias": jax.random.uniform(
            k3, (vocab_size,), jnp.float32, -bound, bound)},
    }
    return p


def _out_bias(p, out):
    if "out_layer" in p:                 # absent in pre-r3 checkpoints
        return out + p["out_layer"]["bias"].astype(out.dtype)
    return out


def decoder_params_from_state_dict(sd):
    """Flat reference ``ha.rnn.Decoder`` state-dict names -> our nested
    pytree (inverse of the dotted flatten the exporter emits)."""
    sd = {k.removeprefix("_orig_mod."): jnp.asarray(np.ascontiguousarray(v))
          for k, v in sd.items() if hasattr(v, "shape")}
    p = {
        "embedding": {"weight": sd["embedding.weight"]},
        "rnn": {k[len("rnn."):]: v for k, v in sd.items()
                if k.startswith("rnn.")},
    }
    if "out_layer.bias" in sd:
        p["out_layer"] = {"bias": sd["out_layer.bias"]}
    return p


def ingest_decoder_params(model):
    """A checkpoint's ``model`` entry -> our nested Decoder pytree.

    Accepts both native nested pytrees and flat reference torch
    state-dicts (dotted names, ha/rnnlm.py checkpoints) — the single
    detection point for every hal-checkpoint consumer (hal resume,
    hac --lm shallow fusion)."""
    if isinstance(model, dict) and any('.' in str(k) for k in model):
        return decoder_params_from_state_dict(model)
    return jax.tree.map(jnp.asarray, model)


def decoder_geometry(params):
    """(num_layers, hidden_dim) from a Decoder pytree."""
    w = params["rnn"]
    layers = sum(1 for k in w if k.startswith("weight_hh_l"))
    return layers, w["weight_hh_l0"].shape[1]


def decoder_init_hidden(num_layers, batch_size, hidden_dim):
    return (jnp.zeros((num_layers, batch_size, hidden_dim)),
            jnp.zeros((num_layers, batch_size, hidden_dim)))


def decoder_apply(p, input_ids, state, *, num_layers, dropout_rate=0.0,
                  key=None, train=False, batch_first=False):
    """LSTM LM forward. input_ids (T, N) or (N, T) if batch_first.
    Returns (logits over vocab, new state)."""
    emb_w = p["embedding"]["weight"]
    ids = jnp.swapaxes(input_ids, 0, 1) if batch_first else input_ids
    emb = embedding(p["embedding"], ids)            # (T, N, E)
    out, state = multilayer_lstm(p["rnn"], emb, state, num_layers=num_layers,
                                 dropout=dropout_rate, dropout_key=key,
                                 deterministic=not train)
    logits = _out_bias(p, out @ emb_w.T.astype(out.dtype))  # tied projection
    if batch_first:
        logits = jnp.swapaxes(logits, 0, 1)
    return logits, state


def decoder_step(p, token_ids, state, *, num_layers):
    """Single LSTM-LM step: token_ids (N,) -> (logits (N, V), state).
    Used by the transducer's streaming greedy decode."""
    from haloop_tpu.nn.lstm import lstm_cell
    emb_w = p["embedding"]["weight"]
    x = embedding(p["embedding"], token_ids)          # (N, E)
    h, c = state
    hs, cs = [], []
    for layer in range(num_layers):
        w_ih = p["rnn"][f"weight_ih_l{layer}"]
        w_hh = p["rnn"][f"weight_hh_l{layer}"]
        bias = p["rnn"][f"bias_ih_l{layer}"] + p["rnn"][f"bias_hh_l{layer}"]
        x_proj = x @ w_ih.T + bias
        hn, cn = lstm_cell(x_proj, h[layer], c[layer], w_hh)
        hs.append(hn)
        cs.append(cn)
        x = hn
    logits = _out_bias(p, x @ emb_w.T)                 # tied projection
    return logits, (jnp.stack(hs), jnp.stack(cs))


def truncate_hidden(state):
    """TBPTT detach (reference ha/rnn.py:75-77): stop gradients flowing
    into the carried state."""
    h, c = state
    return jax.lax.stop_gradient(h), jax.lax.stop_gradient(c)
