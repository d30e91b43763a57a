"""Generate committed golden feature vectors from the torch-primitive
kaldi oracle (tests/kaldi_torch_oracle.py). Run from the repo root:

    python scripts/gen_feature_golden.py

Regenerate ONLY when the kaldi spec reading changes; the committed
bytes are the frozen third opinion (VERDICT r3 next-round item 3)."""

import pathlib
import sys

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "tests")   # same import view pytest gives the tests

import test_features_golden as tg                     # noqa: E402
import kaldi_torch_oracle as oracle                   # noqa: E402


def main():
    out = pathlib.Path("tests/golden")
    out.mkdir(exist_ok=True)
    for name, make in tg.WAVES.items():
        wav = make()
        fb = oracle.fbank(wav, num_mel_bins=80).numpy()
        mf = oracle.mfcc(wav).numpy()
        np.save(out / f"kaldi_fbank80_{name}.npy", fb)
        np.save(out / f"kaldi_mfcc_{name}.npy", mf)
        print(f"{name}: fbank {fb.shape} mfcc {mf.shape} "
              f"fbank[0,:3]={fb[0, :3]}")


if __name__ == "__main__":
    main()
