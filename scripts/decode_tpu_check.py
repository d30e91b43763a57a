"""Smoke-run the on-device decoders on the real TPU backend (finite
scores, expected shapes). Numerical host-vs-device equality lives in
the test suite (tests/test_beam_device.py, tests/test_fusion_beam.py
compare against the host dict algorithm exactly)."""

import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from haloop_tpu.models import recognizer as RE
from haloop_tpu.ops.beam_device import (
    ctc_beam_search_batched, transducer_beam_search_batched)


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)

    # CTC beam
    N, T, V, K = 8, 128, 64, 8
    logits = rng.normal(size=(N, T, V)).astype(np.float32) * 1.5
    lp = jax.nn.log_softmax(jnp.asarray(logits), -1)
    lengths = jnp.asarray(rng.integers(T // 2, T + 1, N).astype(np.int32))
    prefixes, lens, scores = ctc_beam_search_batched(lp, lengths,
                                                     beam_width=K)
    scores = np.asarray(scores)
    print("ctc beam: top scores finite:",
          bool(np.isfinite(scores[:, 0]).all()),
          "max:", float(scores[:, 0].max()), flush=True)

    # transducer decodes
    p = RE.transducer_init(jax.random.PRNGKey(1), feat_dim=64,
                           vocab_size=32, lm_dim=64, lm_layers=1)
    feats = jnp.asarray(rng.normal(size=(N, T, 64)).astype(np.float32))
    hyps, ulen, _, sc = RE.transducer_greedy_decode(
        p, feats, lengths, lm_layers=1, lm_dim=64, max_symbols=32)
    print("transducer greedy: lens", np.asarray(ulen)[:4],
          "scores finite:", bool(np.isfinite(np.asarray(sc)).all()),
          flush=True)

    toks, ulens, bscores = transducer_beam_search_batched(
        p, feats, lengths, beam_width=4, lm_layers=1, lm_dim=64,
        max_symbols=32)
    print("transducer beam: top lens", np.asarray(ulens)[:4, 0],
          "scores finite:",
          bool(np.isfinite(np.asarray(bscores)[:, 0]).all()), flush=True)


if __name__ == "__main__":
    main()
