"""Dataset combinator DSL (reference: ha/data.py) — torch-free.

Datasets are plain objects with __len__/__getitem__/utt_id/duration
returning (index, frames_or_wav (T, C) numpy, text). The descriptor
grammar matches the reference exactly:

    labels:file  randpairs:  head:  wdrop.4:/wdrop.1:  mask:  speed:
    fbank:  mfcc:  sinusoids0..5  sinusoids-eval  bare-path  librispeech-url

Audio IO: PCM .wav via the stdlib wave module, .flac via the native C
decoder (haloop_tpu/native/flac.c) — LibriSpeech ships as FLAC; other
formats raise a clear error. LibriSpeech auto-download is unsupported
here (no network); point `labels:` at local files instead.
"""

import bisect
import wave
from pathlib import Path

import numpy as np

from haloop_tpu import features
from haloop_tpu.sinusoids import SyntheticAlignments


def load_audio(path):
    """(channels, samples) float32 in [-1, 1] + sample rate.

    PCM .wav via the stdlib; .flac via the native C decoder
    (haloop_tpu/native/flac.c) — LibriSpeech, the baseline corpus,
    ships as FLAC (reference reads it through torchaudio,
    ha/data.py:56-63)."""
    path = str(path)
    if path.endswith(".flac"):
        from haloop_tpu.native import decode_flac
        with open(path, "rb") as f:
            frames, sr, bps = decode_flac(f.read())
        return frames.astype(np.float32) / float(2 ** (bps - 1)), sr
    if not path.endswith(".wav"):
        raise ValueError(
            f"only PCM .wav and .flac are supported in this build: {path}")
    with wave.open(path, "rb") as w:
        sr = w.getframerate()
        n = w.getnframes()
        width = w.getsampwidth()
        channels = w.getnchannels()
        raw = w.readframes(n)
    if width == 3:
        # 24-bit PCM: sign-extend 3 little-endian bytes per sample
        b = np.frombuffer(raw, dtype=np.uint8).reshape(-1, 3)
        data = (b[:, 0].astype(np.int32) |
                (b[:, 1].astype(np.int32) << 8) |
                (b[:, 2].astype(np.int8).astype(np.int32) << 16)
                ).astype(np.float32)
    elif width in (1, 2, 4):
        dtype = {1: np.uint8, 2: np.int16, 4: np.int32}[width]
        data = np.frombuffer(raw, dtype=dtype).astype(np.float32)
    else:
        raise ValueError(f"unsupported PCM sample width {width} in {path}")
    if width == 1:
        data = (data - 128.0) / 128.0
    else:
        data = data / float(2 ** (8 * width - 1))
    return data.reshape(-1, channels).T, sr


class ConcatDataset:
    def __init__(self, datasets):
        self.datasets = list(datasets)
        self.cumulative_sizes = np.cumsum(
            [len(d) for d in self.datasets]).tolist()

    def __len__(self):
        return self.cumulative_sizes[-1] if self.cumulative_sizes else 0

    def get_dataset(self, idx):
        if idx < 0:
            if -idx > len(self):
                raise ValueError("index out of range")
            idx = len(self) + idx
        di = bisect.bisect_right(self.cumulative_sizes, idx)
        si = idx if di == 0 else idx - self.cumulative_sizes[di - 1]
        return self.datasets[di], si

    def __getitem__(self, idx):
        d, i = self.get_dataset(idx)
        return d[i]

    def utt_id(self, idx):
        d, i = self.get_dataset(idx)
        return d.utt_id(i)

    def duration(self, idx):
        d, i = self.get_dataset(idx)
        return d.duration(i)


class LabelFile:
    """Kaldi-ish 'utt_or_path TAB text' list; resamples to 16 kHz."""

    def __init__(self, path: Path):
        with open(path) as f:
            self.ark = [line.strip().split(maxsplit=1) for line in f]

    def __len__(self):
        return len(self.ark)

    def utt_id(self, index):
        return self.ark[index][0]

    def duration(self, index):
        filename, _ = self.ark[index]
        if str(filename).endswith(".flac"):
            # STREAMINFO header only — no decode
            import ctypes
            from haloop_tpu.native import flac_library
            lib = flac_library()
            with open(filename, "rb") as f:
                head = f.read(65536)
            ch = ctypes.c_int()
            rate = ctypes.c_int()
            bps = ctypes.c_int()
            total = ctypes.c_longlong()
            if lib and lib.flac_streaminfo(head, len(head), ctypes.byref(ch),
                                           ctypes.byref(rate),
                                           ctypes.byref(bps),
                                           ctypes.byref(total)) == 0:
                return total.value / max(rate.value, 1)
            raise ValueError(f"cannot read FLAC STREAMINFO: {filename}")
        with wave.open(filename, "rb") as w:
            return w.getnframes() / w.getframerate()

    def __getitem__(self, index):
        filename, text = self.ark[index]
        wav, sr = load_audio(filename)
        if sr != 16000:
            if sr not in (16000, 22050, 32000, 44100, 48000):
                raise ValueError(f'unsupported sample rate {sr}')
            wav = np.stack([features.resample(ch, sr) for ch in wav])
        return index, wav, text


class RandomizedPairsDataset(ConcatDataset):
    """Concatenate random utterance pairs with silence between
    (ha/data.py:66-82)."""

    def __init__(self, datasets, seed=0):
        super().__init__(datasets)
        rng = np.random.default_rng(seed)
        self.pair_permutation = rng.permutation(len(self))
        self.silences = rng.integers(160, 4000, len(self))

    def __getitem__(self, index):
        _, wav1, text1 = super().__getitem__(index)
        _, wav2, text2 = super().__getitem__(
            int(self.pair_permutation[index]))
        silence = np.zeros((1, int(self.silences[index])), dtype=wav1.dtype)
        wav = np.concatenate([wav1, silence, wav2], axis=1)
        return index, wav, f'{text1} {text2}'


class Subset:
    def __init__(self, dataset, indices):
        self.dataset = dataset
        self.indices = list(indices)

    def __len__(self):
        return len(self.indices)

    def __getitem__(self, i):
        return self.dataset[self.indices[i]]

    def utt_id(self, i):
        return self.dataset.utt_id(self.indices[i])

    def duration(self, i):
        return self.dataset.duration(self.indices[i])


class Mask(ConcatDataset):
    """SpecAugment-style freq+time masks over spectrograms.

    Draws are deterministic in (seed, epoch, index) — unlike the
    reference's worker-inherited torch RNG (ha/data.py:103-123), an
    augmented run is exactly reproducible; the DataLoader bumps
    ``epoch`` each pass so masks still vary across epochs."""

    def __init__(self, datasets, seed=0):
        super().__init__(datasets)
        self.seed = seed
        self.epoch = 0

    def __getitem__(self, index):
        index, frames, text = super().__getitem__(index)
        rng = np.random.default_rng((self.seed, self.epoch, index))
        return index, features.spec_augment(np.asarray(frames), rng), text


class Speed(ConcatDataset):
    """Speed perturbation in [.95, 1.05]; deterministic in
    (seed, epoch, index) like Mask."""

    def __init__(self, datasets, seed=0):
        super().__init__(datasets)
        self.seed = seed
        self.epoch = 0

    def __getitem__(self, index):
        index, wav, text = super().__getitem__(index)
        rng = np.random.default_rng((self.seed, self.epoch, index))
        return index, features.speed_perturb(wav, rng), text


class Fbank(ConcatDataset):
    def __getitem__(self, index):
        index, wav, text = super().__getitem__(index)
        return index, features.fbank(np.asarray(wav), num_mel_bins=80), text


class Wave(ConcatDataset):
    """Raw waveform as (samples, 1) 'frames' for on-device feature
    extraction: with ``hac --device-fbank`` the jitted train step runs
    features.fbank_jax on the padded batch, so the host never computes
    spectrograms (dataset DSL: ``wav:labels:file``)."""

    def __getitem__(self, index):
        index, wav, text = super().__getitem__(index)
        mono = np.asarray(wav).reshape(-1, np.asarray(wav).shape[-1])[0]
        return index, mono[:, None].astype(np.float32), text


class MFCC(ConcatDataset):
    def __getitem__(self, index):
        index, wav, text = super().__getitem__(index)
        return index, features.cmvn(features.mfcc(np.asarray(wav))), text


class WordDrop(ConcatDataset):
    def __init__(self, datasets, p_drop_words=0.4):
        super().__init__(datasets)
        self.p_drop_words = p_drop_words

    def __getitem__(self, index):
        index, frames, original_text = super().__getitem__(index)
        rng = np.random.default_rng(index)
        text = ' '.join(w for w in original_text.split(' ')
                        if rng.random() > self.p_drop_words)
        if not text:
            text = original_text
        return index, frames, text


def make_dataset(s):
    match s.split(':', maxsplit=1):
        case ['labels', label_file]:
            return LabelFile(Path(label_file))
        case ['randpairs', subset]:
            return RandomizedPairsDataset([make_dataset(subset)])
        case ['head', subset]:
            return Subset(make_dataset(subset), range(16))
        case ['wdrop.4', subset]:
            return WordDrop([make_dataset(subset)], p_drop_words=0.4)
        case ['wdrop.1', subset]:
            return WordDrop([make_dataset(subset)], p_drop_words=0.1)
        case ['mask', subset]:
            return Mask([make_dataset(subset)])
        case ['speed', subset]:
            return Speed([make_dataset(subset)])
        case ['mfcc', subset]:
            return MFCC([make_dataset(subset)])
        case ['fbank', subset]:
            return Fbank([make_dataset(subset)])
        case ['wav', subset]:
            return Wave([make_dataset(subset)])
        case ['sinusoids0']:
            return SyntheticAlignments(examples_per_bin=100000, max=100)
        case ['sinusoids1']:
            return SyntheticAlignments(examples_per_bin=30000, max=500)
        case ['sinusoids2']:
            return SyntheticAlignments(examples_per_bin=15000, max=1000)
        case ['sinusoids3']:
            return SyntheticAlignments(examples_per_bin=5000, max=2000)
        case ['sinusoids4']:
            return SyntheticAlignments(examples_per_bin=5000, max=3000)
        case ['sinusoids5']:
            return SyntheticAlignments(examples_per_bin=5000, max=4000,
                                       seed_offset=200000000)
        case ['sinusoids-eval']:
            return SyntheticAlignments(examples_per_bin=10, max=3000,
                                       seed_offset=100000000)
        case [subset]:
            if Path(subset).exists():
                return LabelFile(Path(subset))
            raise ValueError(
                f"dataset '{subset}' not found; LibriSpeech auto-download "
                "is unavailable in this environment — use labels:path")


def concat_datasets(s):
    if not s:
        return []
    return ConcatDataset([make_dataset(part) for part in s.split(',')])


def main():
    import argparse
    parser = argparse.ArgumentParser()
    parser.add_argument('--count', choices=['labels', 'frames', 'seconds'],
                        default='labels', required=True)
    parser.add_argument('datasets')
    args = parser.parse_args()

    dataset = concat_datasets(args.datasets)

    def histogram(stat):
        unique, counts = np.unique(np.array(stat), return_counts=True)
        mx = counts.max()
        for u, c in zip(unique.tolist(), counts.tolist()):
            print(u, c, '▎' * (c * 50 // mx), sep='\t')

    match args.count:
        case 'labels':
            histogram([len(t.split()) for _, _, t in dataset])
        case 'frames':
            histogram([f.shape[0] for _, f, _ in dataset])
        case 'seconds':
            for index, _, _ in dataset:
                print(dataset.utt_id(index), dataset.duration(index),
                      sep='\t')


if __name__ == '__main__':
    main()
