"""Audio feature frontend: kaldi-compatible log-mel fbank and MFCC,
resampling, speed perturbation, and SpecAugment-style masking.

Replaces the reference's torchaudio C++ dependencies (SURVEY.md §2.4):
torchaudio.compliance.kaldi.{fbank,mfcc} (ha/data.py:139,146),
Resample/SpeedPerturbation (ha/data.py:33-38,129), and
mask_along_axis_iid (ha/data.py:109-121).

Two implementations of fbank share one code path:
  * numpy host-side (dataset workers, exact shapes per utterance)
  * jax batched (``fbank_jax``) for on-device frontends — frames all
    utterances at once; the mel projection is a single matmul that XLA
    fuses with the downstream encoder (TPU-native feature extraction).

Kaldi conventions implemented: 25ms povey window / 10ms shift,
snip_edges, preemphasis 0.97, DC removal, power spectrum, mel scale
1127*ln(1+f/700), low=20Hz high=nyquist, log mel with flooring.
"""

import functools
import math

import numpy as np

SAMPLE_RATE = 16000
FRAME_LENGTH = 400          # 25 ms
FRAME_SHIFT = 160           # 10 ms
NFFT = 512


@functools.lru_cache(maxsize=None)
def povey_window(n=FRAME_LENGTH):
    a = 2 * math.pi / (n - 1)
    return (0.5 - 0.5 * np.cos(a * np.arange(n))) ** 0.85


def mel_scale(f):
    return 1127.0 * np.log1p(f / 700.0)


def inverse_mel(m):
    return 700.0 * (np.expm1(m / 1127.0))


@functools.lru_cache(maxsize=None)
def mel_filterbank(num_bins=80, nfft=NFFT, sr=SAMPLE_RATE, low_freq=20.0,
                   high_freq=0.0):
    """Kaldi-style triangular mel filters over fft bins: (nfft//2+1, bins).

    Cached (like the DCT matrix below): fbank() sits in the per-utterance
    dataset-worker hot path and these are constants of the config."""
    if high_freq <= 0:
        high_freq = sr / 2.0 + high_freq
    fft_freqs = np.arange(nfft // 2 + 1) * sr / nfft
    mel_low, mel_high = mel_scale(low_freq), mel_scale(high_freq)
    mel_points = np.linspace(mel_low, mel_high, num_bins + 2)
    mel_f = mel_scale(fft_freqs)
    left, center, right = mel_points[:-2], mel_points[1:-1], mel_points[2:]
    up = (mel_f[:, None] - left[None, :]) / (center - left)[None, :]
    down = (right[None, :] - mel_f[:, None]) / (right - center)[None, :]
    fb = np.maximum(0.0, np.minimum(up, down))
    return fb.astype(np.float32)


def frame_signal(wav, frame_length=FRAME_LENGTH, frame_shift=FRAME_SHIFT):
    """snip_edges framing: frames fully inside the signal."""
    n = len(wav)
    num_frames = max(0, 1 + (n - frame_length) // frame_shift)
    idx = (np.arange(num_frames)[:, None] * frame_shift +
           np.arange(frame_length)[None, :])
    return wav[idx]


def fbank(wav, num_mel_bins=80, sr=SAMPLE_RATE, preemphasis=0.97,
          remove_dc_offset=True, use_log=True, eps=1.1921e-07):
    """wav: (T,) or (1, T) float waveform in [-1, 1]. Returns
    (frames, bins).

    Scale contract: the waveform is used AS GIVEN, matching the
    reference pipeline exactly — torchaudio.load's normalized floats
    fed straight into torchaudio.compliance.kaldi.fbank, which does
    not rescale (ha/data.py:136-140). Kaldi *binaries* read int16
    sample values; callers wanting compute-fbank-feats parity must
    pre-multiply by 32768 themselves (constant +2*ln(32768) per
    log-mel bin on non-floored frames). Keeping the reference's scale
    is what makes acoustic checkpoints interchangeable across the two
    frameworks."""
    wav = np.asarray(wav, np.float32).reshape(-1)
    frames = frame_signal(wav)
    if remove_dc_offset:
        frames = frames - frames.mean(axis=1, keepdims=True)
    if preemphasis:
        first = frames[:, :1]
        frames = np.concatenate(
            [first - preemphasis * first,
             frames[:, 1:] - preemphasis * frames[:, :-1]], axis=1)
    frames = frames * povey_window()[None, :]
    spec = np.abs(np.fft.rfft(frames, NFFT)) ** 2
    mel = spec @ mel_filterbank(num_mel_bins, sr=sr)
    if use_log:
        mel = np.log(np.maximum(mel, eps))
    return mel.astype(np.float32)


_DCT_CACHE = {}


def _dct_matrix(num_ceps, num_bins):
    key = (num_ceps, num_bins)
    if key not in _DCT_CACHE:
        n = np.arange(num_bins)
        k = np.arange(num_ceps)[:, None]
        m = np.cos(math.pi * k * (2 * n[None, :] + 1) / (2 * num_bins))
        m *= math.sqrt(2.0 / num_bins)
        m[0] *= 1.0 / math.sqrt(2.0)
        _DCT_CACHE[key] = m.astype(np.float32)
    return _DCT_CACHE[key]


def mfcc(wav, num_ceps=13, num_mel_bins=23, cepstral_lifter=22.0):
    """Kaldi-style MFCC (defaults of torchaudio.compliance.kaldi.mfcc)."""
    logmel = fbank(wav, num_mel_bins=num_mel_bins)
    ceps = logmel @ _dct_matrix(num_ceps, num_mel_bins).T
    if cepstral_lifter > 0:
        lift = 1.0 + 0.5 * cepstral_lifter * np.sin(
            math.pi * np.arange(num_ceps) / cepstral_lifter)
        ceps = ceps * lift[None, :]
    return ceps.astype(np.float32)


def resample(wav, orig_freq, new_freq=SAMPLE_RATE):
    """Polyphase resampling (scipy) for the LabelFile sample rates
    (ha/data.py:33-38)."""
    if orig_freq == new_freq:
        return wav
    from scipy.signal import resample_poly
    g = math.gcd(int(orig_freq), int(new_freq))
    return resample_poly(wav, new_freq // g, orig_freq // g).astype(np.float32)


def speed_perturb(wav, rng, factors=(0.95, 0.98, 1.0, 1.02, 1.05)):
    """Random speed change via resampling (SpeedPerturbation semantics)."""
    f = factors[rng.integers(len(factors))]
    if f == 1.0:
        return wav
    # playing at speed f == resampling from sr to sr/f then treating as sr
    from scipy.signal import resample_poly
    up, down = {0.95: (20, 19), 0.98: (50, 49), 1.02: (49, 50),
                1.05: (19, 20)}[f]
    # time is the LAST axis: load_audio yields (channels, samples);
    # the scipy default (axis=0) would "resample" the channel axis
    return resample_poly(wav, up, down, axis=-1).astype(np.float32)


def mask_along_axis(frames, rng, mask_param, axis):
    """SpecAugment-style single mask (mask_along_axis_iid semantics):
    width ~ U[0, mask_param), start uniform."""
    size = frames.shape[axis]
    width = int(rng.integers(0, max(mask_param, 1)))
    if width == 0 or width >= size:
        return frames
    start = int(rng.integers(0, size - width))
    sl = [slice(None)] * frames.ndim
    sl[axis] = slice(start, start + width)
    frames = frames.copy()
    frames[tuple(sl)] = 0.0
    return frames


def spec_augment(frames, rng):
    """freq mask (param = bins//6) + time mask (param 7), matching
    ha/data.py:103-123."""
    frames = mask_along_axis(frames, rng, frames.shape[1] // 6, axis=1)
    frames = mask_along_axis(frames, rng, 7, axis=0)
    return frames


def cmvn(frames):
    """utterance-level mean/variance normalization (ha/data.py:148-151)."""
    frames = frames - frames.mean(axis=0, keepdims=True)
    return frames / (frames.std(axis=0, keepdims=True) + 1e-8)


# ------------------------------------------------------------ jax batched

def fbank_jax(wavs, wav_lengths, num_mel_bins=80):
    """Batched on-device fbank: wavs (N, T) padded, lengths (N,).
    Returns (features (N, F, bins), frame_lengths (N,)).

    The framing is one gather; window+FFT+mel collapse into matmuls that
    XLA fuses — feeding the encoder without any host feature step.
    """
    import jax.numpy as jnp

    N, T = wavs.shape
    # same scale contract as fbank(): waveform used as given
    num_frames = max(0, 1 + (T - FRAME_LENGTH) // FRAME_SHIFT)
    idx = (jnp.arange(num_frames)[:, None] * FRAME_SHIFT +
           jnp.arange(FRAME_LENGTH)[None, :])
    frames = wavs[:, idx]                                   # (N, F, 400)
    frames = frames - frames.mean(axis=-1, keepdims=True)
    first = frames[..., :1]
    frames = jnp.concatenate(
        [first - 0.97 * first, frames[..., 1:] - 0.97 * frames[..., :-1]],
        axis=-1)
    frames = frames * jnp.asarray(povey_window())[None, None, :]
    # rfft via matmul-free jnp.fft (XLA lowers to a TPU-friendly FFT)
    spec = jnp.abs(jnp.fft.rfft(frames, NFFT)) ** 2
    mel = spec @ jnp.asarray(mel_filterbank(num_mel_bins))
    mel = jnp.log(jnp.maximum(mel, 1.1921e-07))
    frame_lengths = jnp.maximum(
        0, 1 + (wav_lengths - FRAME_LENGTH) // FRAME_SHIFT)
    return mel.astype(jnp.float32), frame_lengths
