"""Sinusoid positional codes and the SyntheticAlignments dataset
(reference: ha/sinusoids.py).

SyntheticAlignments is the framework's fake backend for end-to-end
training tests (SURVEY.md §4): deterministic per-index RNG generates
"audio" whose frames are sinusoid codes of the target tokens, so the
alignment is known and a working system reaches ~0 WER without audio.
"""

import numpy as np


def sinusoids_like_np(T, C, base=10000):
    """Interleaved sin/cos code table (ha/sinusoids.py:6-12 semantics)."""
    t = np.arange(T, dtype=np.float32)[:, None]
    exp = -np.arange(0, C, 2, dtype=np.float32) / C
    even = np.sin((base ** exp) * t)
    odd = np.cos((base ** exp) * t)
    return np.stack([even, odd], axis=-1).reshape(T, C).astype(np.float32)


def sinusoids_like(x, base=10000):
    import jax.numpy as jnp
    _, T, C = x.shape
    return jnp.asarray(sinusoids_like_np(T, C, base))


class SyntheticAlignments:
    """Deterministic synthetic speech-like dataset.

    Each index maps to a duration bin; tokens (ids 4..vocab) are emitted
    with random durations 10..19 frames, inputs are the token's sinusoid
    code repeated for its duration.
    """

    def __init__(self, examples_per_bin=3000, min=10, max=16000, step=10,
                 vocab_size=512, dim=80, seed_offset=0):
        self.min = min
        self.max = max
        self.step = step
        self.bins = (self.max - self.min) // self.step + 1
        self.examples_per_bin = examples_per_bin
        self.vocab_size = vocab_size
        self.seed_offset = seed_offset
        self.sinusoids = sinusoids_like_np(vocab_size, dim)

    def __len__(self):
        return self.bins * self.examples_per_bin

    def utt_id(self, index):
        return str(index)

    def duration(self, index):
        time_steps = self.min + (index % self.bins) * self.step
        return time_steps / 100.0     # pretend 100 frames/sec

    def __getitem__(self, index):
        time_steps = self.min + (index % self.bins) * self.step
        rng = np.random.default_rng(self.seed_offset + index)

        t = 0
        targets, durations = [], []
        while t < time_steps:
            duration = int(rng.integers(10, 20))
            durations.append(duration)
            # 0 is pad, 1 is ???, 2 is stx, 3 is etx
            targets.append(int(rng.integers(4, self.vocab_size)))
            t += duration

        alignments = np.concatenate(
            [np.full(r, tok, np.int64) for tok, r in zip(targets, durations)])
        inputs = self.sinusoids[alignments, :]
        return index, inputs, " ".join(map(str, targets))
