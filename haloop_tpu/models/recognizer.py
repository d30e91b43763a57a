"""Recognizer heads implementing the Decodable interface
(reference: ha/recognizer.py).

TemporalClassifier: dropout(0.2) + Linear CTC head. Loss is the fused
CTC lattice (fp32) or Star-CTC when ``star_penalty`` is given; greedy
decode collapses argmax frames fully vectorized on device (no python
loops over frames).

Transducer: Linear transcription head + 2-layer LSTM prediction network
with additive joint; loss is the scan-based RNN-T lattice.
"""

import math

import jax
import jax.numpy as jnp

from haloop_tpu.nn.core import dropout, linear, linear_init
from haloop_tpu.ops.ctc import ctc_forward_score, ctc_reduce_mean
from haloop_tpu.ops.star import star_ctc_forward_score
from haloop_tpu.ops.transducer import transducer_forward_score
from haloop_tpu.models import rnn


# ----------------------------------------------------- TemporalClassifier

def temporal_classifier_init(key, feat_dim=1024, vocab_size=256):
    return {"classifier": linear_init(key, feat_dim, vocab_size)}


def temporal_classifier_log_probs(p, features, *, key=None, train=False,
                                  p_drop=0.2):
    x = dropout(key, features, p_drop, deterministic=not train)
    x = linear(p["classifier"], x)
    return jax.nn.log_softmax(x.astype(jnp.float32), axis=-1)


def temporal_classifier_loss(p, features, targets, input_lengths=None,
                             target_lengths=None, star_penalty=None,
                             key=None, train=False):
    """Mean CTC (or Star-CTC) loss, computed in fp32 like the reference's
    autocast(float32) region (ha/recognizer.py:69-82)."""
    N, T = features.shape[0], features.shape[1]
    if input_lengths is None:
        input_lengths = jnp.full((N,), T, jnp.int32)
    if target_lengths is None:
        target_lengths = jnp.full((N,), targets.shape[-1], jnp.int32)
    log_probs = temporal_classifier_log_probs(p, features, key=key, train=train)
    log_probs = jnp.swapaxes(log_probs, 0, 1)      # (T, N, C)
    if star_penalty is None:
        from haloop_tpu.ops.dispatch import use_pallas
        if use_pallas():
            from haloop_tpu.ops.ctc_pallas import ctc_loss_pallas
            losses = ctc_loss_pallas(log_probs, targets, input_lengths,
                                     target_lengths)
        else:
            losses = ctc_forward_score(log_probs, targets, input_lengths,
                                       target_lengths)
    else:
        from haloop_tpu.ops.dispatch import use_pallas
        if use_pallas():
            from haloop_tpu.ops.star_pallas import star_ctc_loss_pallas
            losses = star_ctc_loss_pallas(log_probs, targets,
                                          input_lengths, target_lengths,
                                          star_penalty=star_penalty)
        else:
            losses = star_ctc_forward_score(log_probs, targets,
                                            input_lengths, target_lengths,
                                            star_penalty=star_penalty)
    return ctc_reduce_mean(losses, jnp.maximum(target_lengths, 1)), {}


def ctc_collapse(alignments, input_lengths):
    """Vectorized greedy CTC collapse: drop repeats and blanks.

    alignments: (N, T) argmax frame labels. Returns (hyps (N, T) padded
    with 0, lengths (N,)). Equivalent to unique_consecutive-minus-blanks
    (ha/recognizer.py:52-57) but batched on device.
    """
    N, T = alignments.shape
    prev = jnp.pad(alignments, ((0, 0), (1, 0)), constant_values=-1)[:, :T]
    valid = jnp.arange(T)[None, :] < input_lengths[:, None]
    keep = (alignments != prev) & (alignments != 0) & valid
    pos = jnp.cumsum(keep, axis=1) - 1              # output slot per frame
    lengths = jnp.max(pos, axis=1) + 1
    lengths = jnp.maximum(lengths, 0)

    def scatter_row(tokens, pos, keep):
        out = jnp.zeros((T,), tokens.dtype)
        idx = jnp.where(keep, pos, T)               # dump dropped frames at T
        return out.at[idx].set(jnp.where(keep, tokens, 0), mode="drop")

    hyps = jax.vmap(scatter_row)(alignments, pos, keep)
    return hyps, lengths.astype(jnp.int32)


def frame_entropy_sum(log_probs, input_lengths, hyp_lengths=None):
    """(Negated, bits) frame-posterior entropy, summed over valid
    frames — decoder-path sign convention (models/transformer.py:311)
    so ``-sum/len`` prints positive in the stat TSV (ha/loop.py:365).

    With ``hyp_lengths`` the sum is rescaled by hyp_len/n_frames so the
    printed ``entropy_per_token`` (which divides by hyp_len) reads as
    the MEAN per-frame entropy in [0, log2 V] — comparable across
    decode modes for the active loop's entropy strategy. (The reference
    returns no entropy at all for CTC decodes, ha/recognizer.py:59.)"""
    ent = jnp.sum(jnp.exp(log_probs) * log_probs, axis=-1) / math.log(2)
    T = log_probs.shape[1]
    valid = jnp.arange(T)[None, :] < input_lengths[:, None]
    total = jnp.sum(jnp.where(valid, ent, 0.0), axis=-1)
    if hyp_lengths is None:
        return total
    frames = jnp.maximum(input_lengths, 1).astype(jnp.float32)
    return total * jnp.maximum(hyp_lengths, 1) / frames


def temporal_classifier_decode(p, features, input_lengths, key=None,
                               train=False):
    """Greedy decode. Returns (hyps, lengths, alignments, scores,
    sum_ent). train=True keeps dropout on (test-time-dropout WER
    estimation, ha/loop.py:345-357)."""
    log_probs = temporal_classifier_log_probs(p, features, key=key,
                                              train=train)
    scores = jnp.max(log_probs, axis=-1)
    alignments = jnp.argmax(log_probs, axis=-1)
    hyps, lengths = ctc_collapse(alignments, input_lengths)
    sum_ent = frame_entropy_sum(log_probs, input_lengths, lengths)
    return hyps, lengths, alignments, scores, sum_ent


# ------------------------------------------------------------- Transducer

def transducer_init(key, feat_dim=1024, vocab_size=256, lm_dim=512,
                    lm_layers=2):
    k1, k2 = jax.random.split(key)
    return {
        "classifier": linear_init(k1, feat_dim, vocab_size),
        "lm": rnn.decoder_init(k2, vocab_size, lm_dim, lm_dim, lm_layers),
    }


def transducer_loss(p, features, targets, input_lengths=None,
                    target_lengths=None, star_penalty=None, key=None,
                    train=False, lm_layers=2, lm_dim=512, p_drop=0.2):
    """Additive joint f[:, :, None, :] + g[:, None, :, :] -> log_softmax
    -> lattice loss; mean over batch (torchaudio rnnt_loss 'mean'
    semantics at ha/recognizer.py:121-126)."""
    N, T = features.shape[0], features.shape[1]
    U = targets.shape[1]
    if input_lengths is None:
        input_lengths = jnp.full((N,), T, jnp.int32)
    if target_lengths is None:
        target_lengths = jnp.full((N,), U, jnp.int32)

    lm_targets = jnp.pad(targets, ((0, 0), (1, 0)))          # blank-started
    # the reference runs its whole forward (prediction net included)
    # under fp16 autocast (ha/loop.py:121, ha/recognizer.py:109-118);
    # bf16 here, with the joint/lattice math kept in fp32 below
    lm_params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if jnp.issubdtype(x.dtype, jnp.floating) else x, p["lm"])
    state = rnn.decoder_init_hidden(lm_layers, N, lm_dim)
    state = jax.tree.map(lambda x: x.astype(jnp.bfloat16), state)
    g, _ = rnn.decoder_apply(lm_params, lm_targets, state,
                             num_layers=lm_layers,
                             batch_first=True)                # (N, U+1, V)

    x = dropout(key, features, p_drop, deterministic=not train)
    f = linear(p["classifier"], x)                            # (N, T, V)

    from haloop_tpu.ops.dispatch import use_pallas
    if use_pallas():
        # fused joint: the (N, T, U+1, V) tensor never exists — the
        # pairwise-lse kernel reduces the vocab axis in VMEM and the DP
        # consumes only blank/emit log-probs (ops/joint_pallas.py)
        from haloop_tpu.ops.joint_pallas import pairwise_lse
        from haloop_tpu.ops.transducer import \
            transducer_forward_score_from_parts
        f32 = f.astype(jnp.float32)
        g32 = g.astype(jnp.float32)
        lse = pairwise_lse(f32, g32)                          # (N, T, U+1)
        blank = f32[:, :, 0][:, :, None] + g32[:, None, :, 0] - lse
        idx = targets.astype(jnp.int32)
        fy = jnp.take_along_axis(f32, idx[:, None, :], axis=2)  # (N, T, U)
        gy = jnp.take_along_axis(g32[:, :-1, :], idx[:, :, None],
                                 axis=2)[..., 0]                # (N, U)
        emit = fy + gy[:, None, :] - lse[:, :, :-1]
        losses = transducer_forward_score_from_parts(
            blank, emit, input_lengths, target_lengths)
    else:
        joint = f[:, :, None, :] + g[:, None, :, :]           # (N, T, U+1, V)
        joint = jax.nn.log_softmax(joint.astype(jnp.float32), axis=-1)
        losses = transducer_forward_score(joint, targets, input_lengths,
                                          target_lengths)
    return jnp.mean(losses), {}


def transducer_greedy_decode(p, features, input_lengths, *, lm_layers=2,
                             lm_dim=512, max_symbols=None, step_budget=None):
    """Batched streaming greedy RNN-T decode, fully on device.

    At each tick the joint of the current frame and prediction-net state
    picks argmax: blank advances time, a label is emitted and advances
    the prediction LSTM. One lax.scan of T + max_symbols ticks covers
    every item (each tick advances t or u). Goes beyond the reference,
    whose Transducer.decode raises NotImplementedError
    (ha/recognizer.py:96-97).

    Returns (hyps (N, max_symbols) 0-padded, lengths, sum_ent, scores)
    where sum_ent accumulates the (negated, bits) entropy of each
    live tick's joint posterior — decoder-path sign convention
    (models/transformer.py:311).
    """
    N, T, F = features.shape
    V = p["classifier"]["weight"].shape[0]
    if max_symbols is None:
        max_symbols = T
    if step_budget is None:
        step_budget = T + max_symbols

    f = linear(p["classifier"], features)              # (N, T, V)
    state0 = rnn.decoder_init_hidden(lm_layers, N, lm_dim)
    g0, state0 = rnn.decoder_step(p["lm"], jnp.zeros((N,), jnp.int32),
                                  state0, num_layers=lm_layers)

    def tick(carry, _):
        t, u, g, state, hyps, score, sum_ent, ticks, done = carry
        f_t = jnp.take_along_axis(
            f, jnp.clip(t, 0, T - 1)[:, None, None], axis=1)[:, 0]  # (N, V)
        logp = jax.nn.log_softmax((f_t + g).astype(jnp.float32), -1)
        tok = jnp.argmax(logp, axis=-1).astype(jnp.int32)
        val = jnp.max(logp, axis=-1)
        ent = jnp.sum(jnp.exp(logp) * logp, -1) / math.log(2)
        blank = tok == 0
        emit = ~blank & ~done & (u < max_symbols)

        hyps = hyps.at[jnp.arange(N), jnp.clip(u, 0, max_symbols - 1)].set(
            jnp.where(emit, tok, hyps[jnp.arange(N),
                                      jnp.clip(u, 0, max_symbols - 1)]))
        score = jnp.where(done, score, score + val)
        sum_ent = jnp.where(done, sum_ent, sum_ent + ent)
        ticks = jnp.where(done, ticks, ticks + 1)

        g_new, state_new = rnn.decoder_step(p["lm"], tok, state,
                                            num_layers=lm_layers)
        g = jnp.where(emit[:, None], g_new, g)
        state = jax.tree.map(
            lambda new, old: jnp.where(emit[None, :, None], new, old),
            state_new, state)

        t = jnp.where(blank & ~done, t + 1, t)
        u = jnp.where(emit, u + 1, u)
        done = done | (t >= input_lengths) | (u >= max_symbols)
        return (t, u, g, state, hyps, score, sum_ent, ticks, done), None

    init = (jnp.zeros((N,), jnp.int32), jnp.zeros((N,), jnp.int32), g0,
            state0, jnp.zeros((N, max_symbols), jnp.int32),
            jnp.zeros((N,), jnp.float32), jnp.zeros((N,), jnp.float32),
            jnp.zeros((N,), jnp.int32),
            # zero-length rows (ragged-batch padding) start done: tick 0
            # would otherwise read clipped frame 0 and may emit a token
            input_lengths < 1)
    (t, u, g, state, hyps, score, sum_ent, ticks, done), _ = jax.lax.scan(
        tick, init, None, length=step_budget)
    # scale so -sum_ent/hyp_len reads as MEAN per-tick entropy (bits)
    sum_ent = sum_ent * jnp.maximum(u, 1) / jnp.maximum(ticks, 1)
    return hyps, u, sum_ent, score
