"""CTC prefix beam search (Graves'14) — reference: ha/beam.py.

Host-side decoder over posted log-probs. Each live prefix carries the
probability of ending in blank (p_b) and in non-blank (p_nb); at every
frame each prefix is expanded by all symbols, repeated-symbol and blank
collapses merge mass back into existing prefixes, and the beam keeps the
top-k by total mass. The reference's prob-space and log-space variants
are both provided (the reference's prob-space variant has an undefined
``device`` bug, ha/beam.py:46 — ours works).

A fully on-device formulation is future work; decoding here is not the
training hot path (greedy decode in models/ is on-device).
"""

import math
from collections import defaultdict

import numpy as np

NEG_INF = -float("inf")


def logaddexp(a, b):
    if a == NEG_INF:
        return b
    if b == NEG_INF:
        return a
    m = max(a, b)
    return m + math.log1p(math.exp(min(a, b) - m))


class _PendingLM:
    """A not-yet-run LM advance: (parent state, token). Materialized
    only for prefixes that survive beam pruning."""

    __slots__ = ("parent", "token")

    def __init__(self, parent, token):
        self.parent = parent
        self.token = token


def ctc_beam_search_decode_logits(logits, beam_width=8, blank=0, topk=1,
                                  lm=None, lm_weight=0.0):
    """logits: (T, V) UNnormalized or log-softmaxed scores for one
    sequence. Returns list of (prefix tuple, log_prob) best-first.

    ``lm``: optional language model for shallow fusion — an object with
    ``start() -> state``, ``next_scores(state) -> (V,) log-probs`` and
    ``advance(state, token) -> state`` (see RNNLMFusion).
    The beam ranks by acoustic + lm_weight * lm log-probability; the
    returned score is the acoustic prefix probability.
    """
    logits = np.asarray(logits, dtype=np.float64)
    logits = logits - _logsumexp(logits, axis=-1, keepdims=True)
    T, V = logits.shape

    # prefix -> [log p ending in blank, log p ending in non-blank]
    beams = {(): (0.0, NEG_INF)}
    # prefix -> (lm_state_or_pending, accumulated lm log-prob). LM
    # advances are LAZY: an extension stores (parent_state, token) and
    # the real advance runs only if the prefix survives pruning —
    # eager advancing costs beam*V device LSTM steps per frame for the
    # <= beam survivors actually needed
    lm_cache = {(): (lm.start() if lm is not None else None, 0.0)}

    def lm_state(prefix):
        state, acc = lm_cache[prefix]
        if isinstance(state, _PendingLM):
            state = lm.advance(state.parent, state.token)
            lm_cache[prefix] = (state, acc)
        return state

    for t in range(T):
        frame = logits[t]
        nxt = defaultdict(lambda: [NEG_INF, NEG_INF])
        lm_scores = {}
        if lm is not None:
            for prefix in beams:
                lm_scores[prefix] = lm.next_scores(lm_state(prefix))
        for prefix, (p_b, p_nb) in beams.items():
            total = logaddexp(p_b, p_nb)
            # blank keeps the prefix, moves mass to the blank state
            entry = nxt[prefix]
            entry[0] = logaddexp(entry[0], total + frame[blank])
            # repeat of the final symbol extends only the blank-ending
            # mass (non-blank-ending repeat collapses into the same
            # prefix's non-blank state)
            if prefix:
                last = prefix[-1]
                entry[1] = logaddexp(entry[1], p_nb + frame[last])
            for c in range(V):
                if c == blank:
                    continue
                ext = prefix + (c,)
                e2 = nxt[ext]
                if prefix and c == prefix[-1]:
                    e2[1] = logaddexp(e2[1], p_b + frame[c])
                else:
                    e2[1] = logaddexp(e2[1], total + frame[c])
                if lm is not None and ext not in lm_cache:
                    state, acc = lm_cache[prefix]   # materialized above
                    lm_cache[ext] = (
                        _PendingLM(state, c),
                        acc + float(lm_scores[prefix][c]))

        def rank(kv):
            prefix, (b, nb) = kv
            score = logaddexp(b, nb)
            if lm is not None:
                score += lm_weight * lm_cache[prefix][1]
            return -score

        beams = dict(sorted(nxt.items(), key=rank)[:beam_width])
        if lm is not None:
            lm_cache = {p: lm_cache[p] for p in beams}

    def final_rank(kv):
        p, score = kv
        if lm is not None:
            return -(score + lm_weight * lm_cache[p][1])
        return -score

    scored = sorted(((p, logaddexp(b, nb)) for p, (b, nb) in beams.items()),
                    key=final_rank)
    return scored[:topk]


class RNNLMFusion:
    """Shallow-fusion adapter over an hal RNN LM (models/rnn.py decoder).

    BASELINE.json headline config: 'transducer + prefix beam-search
    decoding with RNN-LM shallow fusion (rnnlm.py)'.
    """

    def __init__(self, params, num_layers, hidden_dim, bos=0):
        import jax.numpy as jnp
        from haloop_tpu.models import rnn as R
        self.R = R
        self.jnp = jnp
        self.params = params
        self.num_layers = num_layers
        self.hidden_dim = hidden_dim
        self.bos = bos

    def start(self):
        state = self.R.decoder_init_hidden(self.num_layers, 1,
                                           self.hidden_dim)
        logits, state = self.R.decoder_step(
            self.params, self.jnp.array([self.bos], self.jnp.int32), state,
            num_layers=self.num_layers)
        return (state, np.asarray(logits[0]))

    def next_scores(self, state):
        _, logits = state
        x = logits - _logsumexp(logits)
        return x

    def advance(self, state, token):
        lstm_state, _ = state
        logits, lstm_state = self.R.decoder_step(
            self.params, self.jnp.array([token], self.jnp.int32),
            lstm_state, num_layers=self.num_layers)
        return (lstm_state, np.asarray(logits[0]))


def transducer_beam_search(f, pred_params, num_layers, hidden_dim,
                           beam_width=8, blank=0, topk=1,
                           max_expansions=3, lm=None, lm_weight=0.0):
    """Beam search for an RNN-T (Graves'12 style, bounded label
    expansions per frame) with optional shallow LM fusion.

    f: (T, V) transcription-network outputs for one utterance
    (precomputed on device). pred_params: the transducer's prediction
    LSTM (models/rnn.py decoder params). Returns [(prefix, logp)].
    """
    from haloop_tpu.models import rnn as R
    import jax.numpy as jnp

    f = np.asarray(f, dtype=np.float64)
    T, V = f.shape

    def pred_start():
        state = R.decoder_init_hidden(num_layers, 1, hidden_dim)
        logits, state = R.decoder_step(
            pred_params, jnp.array([blank], jnp.int32), state,
            num_layers=num_layers)
        return state, np.asarray(logits[0], dtype=np.float64)

    def pred_advance(state, token):
        logits, state = R.decoder_step(
            pred_params, jnp.array([token], jnp.int32), state,
            num_layers=num_layers)
        return state, np.asarray(logits[0], dtype=np.float64)

    s0, g0 = pred_start()
    lm0 = lm.start() if lm is not None else None
    # prefix -> [logp, pred, lms, lacc], where pred is a materialized
    # (state, g_vec) pair or a _PendingLM(parent_state, token), and lms
    # likewise — prediction-net and fusion-LM advances run LAZILY, only
    # for hypotheses that survive pruning (eager advancing costs
    # beam^2 device LSTM steps per expansion round for <= beam needed)
    beams = {(): [0.0, (s0, g0), lm0, 0.0]}

    def pred_of(v):
        if isinstance(v[1], _PendingLM):
            v[1] = pred_advance(v[1].parent, v[1].token)
        return v[1]

    def lms_of(v):
        if isinstance(v[2], _PendingLM):
            v[2] = lm.advance(v[2].parent, v[2].token)
        return v[2]

    def fused(v):
        return v[0] + lm_weight * v[3]

    for t in range(T):
        frontier = dict(beams)
        settled = {}
        for round_ in range(max_expansions + 1):
            # the final round only settles blanks: its label extensions
            # could never be consumed (the loop exits before they are
            # processed), so generating them would be discarded work
            expansions_live = round_ < max_expansions
            nxt_frontier = {}
            for prefix, v in frontier.items():
                logp, lacc = v[0], v[3]
                state, g = pred_of(v)
                joint = f[t] + g
                joint = joint - _logsumexp(joint)
                # blank: this hypothesis consumes frame t
                blank_lp = logp + joint[blank]
                if prefix in settled:
                    settled[prefix][0] = logaddexp(settled[prefix][0],
                                                   blank_lp)
                else:
                    settled[prefix] = [blank_lp, v[1], v[2], lacc]
                if not expansions_live:
                    continue
                # labels: extend within the same frame
                lm_vec = lm.next_scores(lms_of(v)) if lm is not None \
                    else None
                order = np.argsort(joint)[::-1]
                added = 0
                for c in order:
                    if c == blank:
                        continue
                    ext = prefix + (int(c),)
                    lp = logp + joint[c]
                    nlacc = lacc + float(lm_vec[int(c)]) \
                        if lm is not None else lacc
                    if ext not in nxt_frontier or lp > nxt_frontier[ext][0]:
                        nxt_frontier[ext] = [
                            lp, _PendingLM(state, int(c)),
                            _PendingLM(v[2], int(c)) if lm is not None
                            else None, nlacc]
                    added += 1
                    if added >= beam_width:
                        break
            if not nxt_frontier:
                break
            frontier = dict(sorted(nxt_frontier.items(),
                                   key=lambda kv: -fused(kv[1]))
                            [:beam_width])
        beams = dict(sorted(settled.items(),
                            key=lambda kv: -fused(kv[1]))[:beam_width])

    # rank by acoustic + fused LM mass (same convention as the CTC
    # host final_rank and the on-device beam), report the acoustic score
    ranked = sorted(beams.items(), key=lambda kv: -fused(kv[1]))
    return [(p, v[0]) for p, v in ranked[:topk]]


def ctc_beam_search_decode_probs(probs, beam_width=8, blank=0, topk=1):
    """Probability-space variant: probs (T, V) rows summing to 1."""
    probs = np.asarray(probs, dtype=np.float64)
    logits = np.log(np.maximum(probs, 1e-300))
    return [(p, math.exp(lp)) for p, lp in
            ctc_beam_search_decode_logits(logits, beam_width, blank, topk)]


def _logsumexp(a, axis=-1, keepdims=False):
    m = np.max(a, axis=axis, keepdims=True)
    out = np.log(np.sum(np.exp(a - m), axis=axis, keepdims=True)) + m
    return out if keepdims else np.squeeze(out, axis=axis)
