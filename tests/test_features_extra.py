"""Resampler/speed-perturbation physics and hala evaluation math."""

import numpy as np

from haloop_tpu import features


def dominant_freq(x, sr):
    spec = np.abs(np.fft.rfft(x * np.hanning(len(x))))
    return np.argmax(spec[1:]) + 1, sr / len(x)


def test_resample_preserves_frequency():
    sr_in, sr_out, f0 = 48000, 16000, 440.0
    t = np.arange(sr_in) / sr_in
    x = np.sin(2 * np.pi * f0 * t).astype(np.float32)
    y = features.resample(x, sr_in, sr_out)
    assert abs(len(y) - sr_out) <= 2
    k, df = dominant_freq(y[:sr_out], sr_out)
    assert abs(k * df - f0) < 2.0


def test_speed_perturb_changes_length():
    rng = np.random.default_rng(0)
    x = rng.normal(size=16000).astype(np.float32)

    class FixedRng:
        def __init__(self, v):
            self.v = v

        def integers(self, n):
            return self.v

    slow = features.speed_perturb(x, FixedRng(0))   # 0.95
    fast = features.speed_perturb(x, FixedRng(4))   # 1.05
    same = features.speed_perturb(x, FixedRng(2))   # 1.0
    assert len(same) == len(x)
    assert abs(len(slow) / len(x) - 1 / 0.95) < 0.01
    assert abs(len(fast) / len(x) - 1 / 1.05) < 0.01


def test_spec_augment_zeroes_bands():
    rng = np.random.default_rng(1)
    frames = np.ones((50, 80), np.float32)
    out = features.spec_augment(frames, rng)
    assert out.shape == frames.shape
    assert (out == 0).any() or (out == frames).all()


def test_hala_eval_bpb_math(tmp_path):
    """Token-weighted val loss and bits-per-byte follow the reference
    formulas (ha/attention_loop.py:156-174)."""
    import math
    # synthetic: loss sums over (y > 0) tokens; bpb = sum_loss/bytes/ln2
    losses = [10.0, 20.0]
    counts = [5, 5]
    eval_bytes = 100.0
    val_loss = sum(losses) / sum(counts)
    val_bpb = (sum(losses) / eval_bytes) / math.log(2)
    assert abs(val_loss - 3.0) < 1e-9
    assert abs(val_bpb - 30.0 / eval_bytes / math.log(2)) < 1e-9
