"""Feature frontend vs the torch-primitive kaldi oracle + committed
golden vectors (VERDICT r3 Missing #1 / next-round item 3).

Three independent derivations must agree:
  1. haloop_tpu.features (numpy production path + jax batched path)
  2. tests/test_features_extra.oracle_fbank (per-frame numpy DFT loop)
  3. tests/kaldi_torch_oracle (torch primitives, torchaudio-compliance
     structure)
plus committed .npy golden vectors produced by (3), so a future edit to
any implementation is caught against frozen bytes, not a co-edited twin.
"""

import numpy as np
import pytest

from haloop_tpu import features

import kaldi_torch_oracle as oracle    # tests dir is on sys.path (pytest)

GOLDEN = __import__('pathlib').Path(__file__).parent / 'golden'


def _wave_mix(n=19200, seed=42):
    """Tone mix + noise: excites every mel band. [-1, 1] scale."""
    rng = np.random.default_rng(seed)
    t = np.arange(n) / 16000.0
    wav = (0.3 * np.sin(2 * np.pi * 440 * t)
           + 0.2 * np.sin(2 * np.pi * 3200 * t)
           + 0.1 * np.sin(2 * np.pi * 7100 * t)
           + 0.05 * rng.standard_normal(n))
    return wav.astype(np.float32)


def _wave_quantized(n=8000, seed=7):
    """int16-quantized noise: the scale real PCM decoding produces."""
    rng = np.random.default_rng(seed)
    q = np.round(rng.standard_normal(n) * 0.02 * 32768.0)
    return (np.clip(q, -32768, 32767) / 32768.0).astype(np.float32)


def _wave_with_silence(n=8000, seed=9):
    """Digital-zero head/tail: exercises the eps log floor."""
    rng = np.random.default_rng(seed)
    wav = np.zeros(n, np.float32)
    wav[2400:5600] = (0.1 * rng.standard_normal(3200)).astype(np.float32)
    return wav


WAVES = {
    'mix': _wave_mix,
    'quantized': _wave_quantized,
    'silence': _wave_with_silence,
}


@pytest.mark.parametrize('name', sorted(WAVES))
def test_fbank_matches_torch_oracle(name):
    wav = WAVES[name]()
    got = features.fbank(wav)
    want = oracle.fbank(wav, num_mel_bins=80).numpy()
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize('name', sorted(WAVES))
def test_mfcc_matches_torch_oracle(name):
    wav = WAVES[name]()
    got = features.mfcc(wav)
    want = oracle.mfcc(wav).numpy()
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_fbank_jax_matches_torch_oracle():
    import jax.numpy as jnp
    wav = _wave_mix(9600)
    feats, lens = features.fbank_jax(
        jnp.asarray(wav)[None, :], jnp.asarray([len(wav)]))
    want = oracle.fbank(wav, num_mel_bins=80).numpy()
    assert int(lens[0]) == want.shape[0]
    np.testing.assert_allclose(
        np.asarray(feats[0]), want, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize('name', sorted(WAVES))
def test_fbank_matches_committed_golden(name):
    """Frozen bytes: regenerate with scripts/gen_feature_golden.py ONLY
    when the spec itself changes, never to make a code change pass."""
    wav = WAVES[name]()
    want = np.load(GOLDEN / f'kaldi_fbank80_{name}.npy')
    np.testing.assert_allclose(
        features.fbank(wav), want, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize('name', sorted(WAVES))
def test_mfcc_matches_committed_golden(name):
    wav = WAVES[name]()
    want = np.load(GOLDEN / f'kaldi_mfcc_{name}.npy')
    np.testing.assert_allclose(
        features.mfcc(wav), want, rtol=1e-4, atol=1e-4)


def test_silence_hits_log_floor():
    """All-zero audio must produce exactly log(eps) everywhere in all
    three derivations (the flooring is part of the contract)."""
    wav = np.zeros(4000, np.float32)
    got = features.fbank(wav)
    want = oracle.fbank(wav, num_mel_bins=80).numpy()
    np.testing.assert_allclose(got, np.log(1.1921e-07), rtol=1e-6)
    np.testing.assert_allclose(want, np.log(1.1921e-07), rtol=1e-6)
