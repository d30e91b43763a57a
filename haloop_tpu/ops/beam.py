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


def ctc_beam_search_decode_logits(logits, beam_width=8, blank=0, topk=1,
                                  lm=None, lm_weight=0.0):
    """logits: (T, V) UNnormalized or log-softmaxed scores for one
    sequence. Returns list of (prefix tuple, log_prob) best-first.

    ``lm``: optional language model for shallow fusion — an object with
    ``start() -> state`` and ``score(state, token) -> (logp_vec, fn)``
    where logp_vec is the (V,)-ish log-prob of each next token and
    ``fn(token) -> state`` advances the state (see RNNLMFusion).
    The beam ranks by acoustic + lm_weight * lm log-probability; the
    returned score is the acoustic prefix probability.
    """
    logits = np.asarray(logits, dtype=np.float64)
    logits = logits - _logsumexp(logits, axis=-1, keepdims=True)
    T, V = logits.shape

    # prefix -> [log p ending in blank, log p ending in non-blank]
    beams = {(): (0.0, NEG_INF)}
    lm_cache = {(): (lm.start() if lm is not None else None, 0.0)}

    for t in range(T):
        frame = logits[t]
        nxt = defaultdict(lambda: [NEG_INF, NEG_INF])
        lm_scores = {}
        if lm is not None:
            for prefix in beams:
                state, acc = lm_cache[prefix]
                lm_scores[prefix] = lm.next_scores(state)
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
                    state, acc = lm_cache[prefix]
                    lm_cache[ext] = (
                        lm.advance(state, c),
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
    # prefix -> (logp, pred_state, g_vec, lm_state, lm_acc)
    beams = {(): (0.0, s0, g0, lm0, 0.0)}

    for t in range(T):
        frontier = dict(beams)
        settled = {}
        for _ in range(max_expansions + 1):
            nxt_frontier = {}
            for prefix, (logp, state, g, lms, lacc) in frontier.items():
                joint = f[t] + g
                joint = joint - _logsumexp(joint)
                # blank: this hypothesis consumes frame t
                blank_lp = logp + joint[blank]
                if prefix in settled:
                    old = settled[prefix]
                    settled[prefix] = (logaddexp(old[0], blank_lp),) + \
                        old[1:]
                else:
                    settled[prefix] = (blank_lp, state, g, lms, lacc)
                # labels: extend within the same frame
                order = np.argsort(joint)[::-1]
                added = 0
                for c in order:
                    if c == blank:
                        continue
                    ext = prefix + (int(c),)
                    lp = logp + joint[c]
                    ns, ng = pred_advance(state, int(c))
                    nlms, nlacc = lms, lacc
                    if lm is not None:
                        nlacc = lacc + float(lm.next_scores(lms)[int(c)])
                        nlms = lm.advance(lms, int(c))
                    if ext not in nxt_frontier or lp > nxt_frontier[ext][0]:
                        nxt_frontier[ext] = (lp, ns, ng, nlms, nlacc)
                    added += 1
                    if added >= beam_width:
                        break
            if not nxt_frontier:
                break
            frontier = dict(sorted(
                nxt_frontier.items(),
                key=lambda kv: -(kv[1][0] + lm_weight * kv[1][4])
            )[:beam_width])
        beams = dict(sorted(
            settled.items(),
            key=lambda kv: -(kv[1][0] + lm_weight * kv[1][4])
        )[:beam_width])

    scored = sorted(((p, v[0]) for p, v in beams.items()),
                    key=lambda kv: -kv[1])
    return scored[:topk]


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
