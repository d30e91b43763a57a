"""Batched on-device CTC prefix beam search.

The reference's prefix search (ha/beam.py) is a python dict-of-prefixes
loop ("FIXME: speed it up", used at ha/recognizer.py:58). This is the
fixed-beam reformulation SURVEY.md §7 calls for: beam state lives in
fixed-shape arrays, every frame is one vectorized update inside a
``lax.scan``, and the whole batch decodes in a single jitted call.

Exactness: with beam width K this computes the same beams as the exact
dict algorithm restricted to K survivors. The only cross-candidate
merge that can occur is an extension of beam j colliding with an
existing beam i's prefix (extensions of distinct prefixes are pairwise
distinct); that case is detected with a K×K prefix-prefix match and
folded into beam i's non-blank mass, and tests assert exact score
equality with the host implementation.

State per item:
  prefixes (K, L) int32, lens (K,), p_b (K,), p_nb (K,)
Per frame: K stay-candidates + K*V extension-candidates -> top-K.
"""

import functools

import jax
import jax.numpy as jnp

from haloop_tpu.ops.semiring import NEG_INF, logaddexp


def _fit_vocab(lm_logp, V):
    """Align an LM's vocab axis to the acoustic vocab (slice or pad)."""
    VL = lm_logp.shape[-1]
    if VL >= V:
        return lm_logp[..., :V]
    pad = jnp.full(lm_logp.shape[:-1] + (V - VL,), NEG_INF,
                   lm_logp.dtype)
    return jnp.concatenate([lm_logp, pad], -1)


def _frame_update(state, logp, K, V, L, lm=None):
    """One beam-search frame. ``lm`` enables shallow fusion: a tuple
    (lm_acc (K,), lm_logp (K, V), weight) — candidates are RANKED by
    acoustic + weight * lm mass while p_b/p_nb stay purely acoustic
    (matching the host search, ops/beam.py rank()). Returns the new
    state plus (parent, ext_tok, is_stay, new_lm_acc) so the caller can
    advance per-beam LM recurrent state for extended beams."""
    prefixes, lens, p_b, p_nb = state
    total = logaddexp(p_b, p_nb)                      # (K,)

    last = jnp.take_along_axis(
        prefixes, jnp.maximum(lens - 1, 0)[:, None], axis=1)[:, 0]
    last = jnp.where(lens > 0, last, -1)              # (K,)
    valid = lens >= 0

    # ---- stay candidates: same prefix
    stay_pb = jnp.where(valid, total + logp[0], NEG_INF)
    rep = jnp.where(last >= 0, logp[jnp.maximum(last, 0)], NEG_INF)
    stay_pnb = jnp.where(valid & (last >= 0), p_nb + rep, NEG_INF)

    # ---- extension candidates: (K, V), token c appended to beam j
    base = jnp.where(jnp.arange(V)[None, :] == last[:, None],
                     p_b[:, None], total[:, None])    # repeat needs a blank
    ext = base + logp[None, :]                        # (K, V)
    ext = jnp.where(valid[:, None], ext, NEG_INF)
    ext = ext.at[:, 0].set(NEG_INF)                   # blank never extends

    # ---- merge extensions that equal an existing beam's prefix:
    # ext(j, c) == prefix_i  iff  len_i == len_j + 1, prefix_i[:len_j]
    # == prefix_j[:len_j], and c == last_i.
    pos = jnp.arange(L)[None, None, :]
    eq = (prefixes[None, :, :] == prefixes[:, None, :]) | \
        (pos >= lens[:, None, None])                  # compare first len_j
    pp_match = jnp.all(eq, axis=-1) & \
        (lens[None, :] == lens[:, None] + 1) & \
        valid[:, None] & valid[None, :]               # (K j, K i)

    merge_tok = jnp.where(pp_match, last[None, :], 0)  # c to merge, per (j,i)
    merge_score = jnp.where(
        pp_match,
        jnp.take_along_axis(ext, merge_tok, axis=1),
        NEG_INF)                                       # (K, K)
    # fold into stay i's non-blank mass
    add_i = _logsumexp_cols(merge_score)               # (K,)
    stay_pnb = logaddexp(stay_pnb, add_i)
    # remove merged extensions from the candidate pool
    ext = _scatter_neg_inf(ext, pp_match, merge_tok)

    # ---- top-K over all candidates
    stay_total = logaddexp(stay_pb, stay_pnb)
    all_scores = jnp.concatenate([stay_total, ext.reshape(-1)])
    if lm is not None:
        lm_acc, lm_logp, weight = lm
        lm_logp = _fit_vocab(lm_logp, V)
        # stays keep their prefix's accumulated LM mass; extensions add
        # the LM prob of the appended token
        rank = jnp.concatenate([
            stay_total + weight * lm_acc,
            (ext + weight * (lm_acc[:, None] + lm_logp)).reshape(-1)])
        rank = jnp.where(all_scores <= NEG_INF / 2, NEG_INF, rank)
    else:
        rank = all_scores
    _, top_idx = jax.lax.top_k(rank, K)

    is_stay = top_idx < K
    stay_j = jnp.where(is_stay, top_idx, 0)
    ext_flat = jnp.maximum(top_idx - K, 0)
    ext_j = ext_flat // V
    ext_c = ext_flat % V
    parent = jnp.where(is_stay, stay_j, ext_j)

    new_prefixes = prefixes[parent]                    # (K, L)
    new_lens = lens[parent]
    append_pos = jnp.clip(new_lens, 0, L - 1)
    appended = jax.vmap(
        lambda row, p, c: row.at[p].set(c))(new_prefixes, append_pos,
                                            ext_c.astype(prefixes.dtype))
    new_prefixes = jnp.where(is_stay[:, None], new_prefixes, appended)
    new_lens = jnp.where(is_stay, new_lens,
                         jnp.minimum(new_lens + 1, L))
    new_pb = jnp.where(is_stay, stay_pb[stay_j], NEG_INF)
    new_pnb = jnp.where(is_stay, stay_pnb[stay_j],
                        ext.reshape(-1)[ext_flat])
    # candidates that scored NEG_INF are dead: mark invalid
    chosen = all_scores[top_idx]
    new_lens = jnp.where(chosen <= NEG_INF / 2, -1, new_lens)
    new_lm_acc = None
    if lm is not None:
        new_lm_acc = lm_acc[parent] + jnp.where(
            is_stay, 0.0, lm_logp[parent, ext_c])
    return (new_prefixes, new_lens, new_pb, new_pnb,
            parent, ext_c, is_stay, new_lm_acc)


def _logsumexp_cols(m):
    """logaddexp-reduce each column of (K, K), NEG_INF-safe."""
    out = jnp.full((m.shape[1],), NEG_INF)
    for j in range(m.shape[0]):
        out = logaddexp(out, m[j])
    return out


def _scatter_neg_inf(ext, pp_match, merge_tok):
    K = ext.shape[0]
    for i in range(K):
        row_mask = pp_match[:, i]
        tok = merge_tok[:, i]
        onehot = jax.nn.one_hot(tok, ext.shape[1], dtype=bool) & \
            row_mask[:, None]
        ext = jnp.where(onehot, NEG_INF, ext)
    return ext


def transducer_beam_search_batched(p, features, lengths, *, beam_width=4,
                                   lm_layers=2, lm_dim=512,
                                   max_symbols=None, fusion_params=None,
                                   fusion_layers=2, fusion_dim=512,
                                   lm_weight=0.3, return_entropy=False):
    """Batched on-device monotonic RNN-T beam search.

    Monotonic = at most one label per frame (each frame every beam
    either settles with blank or emits exactly one label); adequate for
    speech where labels span many frames, and it keeps all shapes fixed.
    With beam_width=1 this equals monotonic greedy decoding. Beams carry
    their own prediction-net LSTM state; selected extensions advance it
    batched over K.

    Optional shallow fusion with an external hal RNN LM
    (``fusion_params``): extension candidates add
    ``lm_weight * log P_lm(token | prefix)`` and each beam carries the
    external LM's recurrent state alongside the prediction net's
    (the on-device analog of ops/beam.py transducer_beam_search's
    ``lm=``; BASELINE.json beam+LM headline config). The carried and
    returned score is the combined ranking score.

    p: transducer params (models/recognizer.transducer_init layout).
    features: (N, T, F); lengths: (N,).
    Returns (tokens (N, K, U), ulens (N, K), scores (N, K)) best-first;
    with ``return_entropy`` a 4th array (N, K) carries each beam's
    accumulated per-frame joint-posterior entropy sum (negated, bits —
    the stat-TSV convention, models/transformer.py:311).
    """
    import math as _math
    from haloop_tpu.models import rnn as R
    from haloop_tpu.nn.core import linear

    N, T, F = features.shape
    V = p["classifier"]["weight"].shape[0]
    K = beam_width
    U = max_symbols or T
    use_lm = fusion_params is not None

    f_all = linear(p["classifier"], features)          # (N, T, V)

    def lm_step(tokens, h, c):
        """Batched prediction-net step over K beams."""
        logits, (h, c) = R.decoder_step(
            p["lm"], tokens, (h, c), num_layers=lm_layers)
        return logits, h, c

    def fusion_step(tokens, h, c):
        logits, (h, c) = R.decoder_step(fusion_params, tokens, (h, c),
                                        num_layers=fusion_layers)
        return jax.nn.log_softmax(logits.astype(jnp.float32), -1), h, c

    def decode_one(f, length):
        tokens0 = jnp.zeros((K, U), jnp.int32)
        ulens0 = jnp.zeros((K,), jnp.int32)
        score0 = jnp.full((K,), NEG_INF).at[0].set(0.0)
        ent0 = jnp.zeros((K,))
        h0 = jnp.zeros((lm_layers, K, lm_dim))
        c0 = jnp.zeros((lm_layers, K, lm_dim))
        g0, h0, c0 = lm_step(jnp.zeros((K,), jnp.int32), h0, c0)
        if use_lm:
            hf0 = jnp.zeros((fusion_layers, K, fusion_dim))
            cf0 = jnp.zeros((fusion_layers, K, fusion_dim))
            gf0, hf0, cf0 = fusion_step(jnp.zeros((K,), jnp.int32),
                                        hf0, cf0)
            lm0 = (hf0, cf0, gf0)
        else:
            lm0 = None

        def frame(state, inp):
            (tokens, ulens, score, ent, h, c, g), lm_state = state
            f_t, t = inp
            joint = jax.nn.log_softmax(
                (f_t[None, :] + g).astype(jnp.float32), -1)   # (K, V)
            fent = jnp.sum(jnp.exp(joint) * joint, -1) / _math.log(2)

            settle = score + joint[:, 0]                      # (K,)
            extend = score[:, None] + joint                   # (K, V)
            if use_lm:
                hf, cf, gf = lm_state
                extend = extend + lm_weight * _fit_vocab(gf, V)
            extend = extend.at[:, 0].set(NEG_INF)
            extend = jnp.where(ulens[:, None] >= U, NEG_INF, extend)

            allc = jnp.concatenate([settle, extend.reshape(-1)])
            top_score, top_idx = jax.lax.top_k(allc, K)
            is_settle = top_idx < K
            parent = jnp.where(is_settle, top_idx,
                               (top_idx - K) // V)
            tok = jnp.where(is_settle, 0, (top_idx - K) % V)

            new_tokens = tokens[parent]
            new_ulens = ulens[parent]
            pos = jnp.clip(new_ulens, 0, U - 1)
            appended = jax.vmap(lambda r, q, c_: r.at[q].set(c_))(
                new_tokens, pos, tok)
            new_tokens = jnp.where(is_settle[:, None], new_tokens,
                                   appended)
            new_ulens = jnp.where(is_settle, new_ulens,
                                  jnp.minimum(new_ulens + 1, U))
            new_ent = ent[parent] + fent[parent]
            new_h = h[:, parent]
            new_c = c[:, parent]
            new_g = g[parent]

            # advance the prediction net for extended beams
            g2, h2, c2 = lm_step(tok, new_h, new_c)
            new_g = jnp.where(is_settle[:, None], new_g, g2)
            new_h = jnp.where(is_settle[None, :, None], new_h, h2)
            new_c = jnp.where(is_settle[None, :, None], new_c, c2)

            if use_lm:
                # advance the external LM for extended beams
                new_hf, new_cf = hf[:, parent], cf[:, parent]
                gf2, hf2, cf2 = fusion_step(tok, new_hf, new_cf)
                new_gf = jnp.where(is_settle[:, None], gf[parent], gf2)
                new_hf = jnp.where(is_settle[None, :, None], new_hf, hf2)
                new_cf = jnp.where(is_settle[None, :, None], new_cf, cf2)
                new_lm = (new_hf, new_cf, new_gf)
            else:
                new_lm = None

            new = ((new_tokens, new_ulens, top_score, new_ent, new_h,
                    new_c, new_g), new_lm)
            cur = ((tokens, ulens, score, ent, h, c, g), lm_state)
            return jax.tree.map(
                lambda n, o: jnp.where(
                    jnp.reshape(t < length, (1,) * n.ndim), n, o),
                new, cur), None

        state0 = ((tokens0, ulens0, score0, ent0, h0, c0, g0), lm0)
        state, _ = jax.lax.scan(frame, state0, (f, jnp.arange(T)))
        tokens, ulens, score, ents = (state[0][0], state[0][1],
                                      state[0][2], state[0][3])
        order = jnp.argsort(-score)
        if return_entropy:
            return (tokens[order], ulens[order], score[order],
                    ents[order])
        return tokens[order], ulens[order], score[order]

    return jax.vmap(decode_one)(f_all, lengths)


@functools.partial(jax.jit, static_argnames=("beam_width", "fusion_layers",
                                              "fusion_dim"))
def ctc_beam_search_batched(log_probs, lengths, beam_width=8,
                            fusion_params=None, fusion_layers=2,
                            fusion_dim=512, lm_weight=0.3):
    """log_probs: (N, T, V) log-softmaxed, blank=0; lengths: (N,).

    Optional shallow fusion with an hal RNN LM (``fusion_params`` =
    models/rnn.py decoder params): candidates are ranked by acoustic +
    lm_weight * LM log-prob of the prefix, the reported score stays
    acoustic — the on-device analog of ops/beam.py's host search with
    RNNLMFusion (BASELINE.json beam+LM config).

    Returns (prefixes (N, K, T), lens (N, K), scores (N, K)) sorted
    best-first; invalid beams have len -1.
    """
    from haloop_tpu.models import rnn as R

    N, T, V = log_probs.shape
    K, L = beam_width, T
    use_lm = fusion_params is not None

    prefixes0 = jnp.zeros((K, L), jnp.int32)
    lens0 = jnp.full((K,), -1, jnp.int32).at[0].set(0)
    pb0 = jnp.full((K,), NEG_INF).at[0].set(0.0)
    pnb0 = jnp.full((K,), NEG_INF)

    def lm_step(tokens, h, c):
        logits, (h, c) = R.decoder_step(fusion_params, tokens, (h, c),
                                        num_layers=fusion_layers)
        return jax.nn.log_softmax(logits.astype(jnp.float32), -1), h, c

    def decode_one(lp, length):
        if use_lm:
            h0 = jnp.zeros((fusion_layers, K, fusion_dim))
            c0 = jnp.zeros((fusion_layers, K, fusion_dim))
            g0, h0, c0 = lm_step(jnp.zeros((K,), jnp.int32), h0, c0)
            lm0 = (jnp.zeros((K,)), h0, c0, g0)
        else:
            lm0 = None

        def step(state, inp):
            frame, t = inp
            beams, lm_state = state
            if use_lm:
                lm_acc, h, c, g = lm_state
                out = _frame_update(beams, frame, K, V, L,
                                    lm=(lm_acc, g, lm_weight))
                (*new_beams, parent, ext_c, is_stay, new_acc) = out
                new_h, new_c = h[:, parent], c[:, parent]
                g2, h2, c2 = lm_step(ext_c, new_h, new_c)
                new_g = jnp.where(is_stay[:, None], g[parent], g2)
                new_h = jnp.where(is_stay[None, :, None], new_h, h2)
                new_c = jnp.where(is_stay[None, :, None], new_c, c2)
                new_state = (tuple(new_beams),
                             (new_acc, new_h, new_c, new_g))
            else:
                out = _frame_update(beams, frame, K, V, L)
                new_state = (out[:4], None)
            state = jax.tree.map(
                lambda n, o: jnp.where(t < length, n, o), new_state, state)
            return state, None

        state, _ = jax.lax.scan(
            step, ((prefixes0, lens0, pb0, pnb0), lm0),
            (lp, jnp.arange(T)))
        (prefixes, lens, p_b, p_nb), lm_state = state
        scores = logaddexp(p_b, p_nb)
        rank = scores + lm_weight * lm_state[0] if use_lm else scores
        order = jnp.argsort(-jnp.where(lens < 0, NEG_INF, rank))
        return prefixes[order], lens[order], scores[order]

    return jax.vmap(decode_one)(log_probs, lengths)
