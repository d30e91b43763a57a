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


def ctc_beam_search_decode_logits(logits, beam_width=8, blank=0, topk=1):
    """logits: (T, V) UNnormalized or log-softmaxed scores for one
    sequence. Returns list of (prefix tuple, log_prob) best-first."""
    logits = np.asarray(logits, dtype=np.float64)
    logits = logits - _logsumexp(logits, axis=-1, keepdims=True)
    T, V = logits.shape

    # prefix -> [log p ending in blank, log p ending in non-blank]
    beams = {(): (0.0, NEG_INF)}

    for t in range(T):
        frame = logits[t]
        nxt = defaultdict(lambda: [NEG_INF, NEG_INF])
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
                if prefix and c == prefix[-1]:
                    ext = prefix + (c,)
                    e2 = nxt[ext]
                    e2[1] = logaddexp(e2[1], p_b + frame[c])
                else:
                    ext = prefix + (c,)
                    e2 = nxt[ext]
                    e2[1] = logaddexp(e2[1], total + frame[c])
        beams = dict(sorted(
            nxt.items(), key=lambda kv: -logaddexp(kv[1][0], kv[1][1])
        )[:beam_width])

    scored = sorted(((p, logaddexp(b, nb)) for p, (b, nb) in beams.items()),
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
