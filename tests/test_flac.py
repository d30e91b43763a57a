"""Native FLAC decoder (haloop_tpu/native/flac.c) round-trip tests.

A minimal spec-conforming FLAC *encoder* lives in this test: it writes
STREAMINFO plus frames using verbatim, constant, and fixed-order-2
rice-coded subframes (with real CRC-8/CRC-16 footers), covering the
bitreader, rice partitions, fixed predictors, and stereo interleave of
the decoder. LibriSpeech — the baseline corpus — ships as FLAC
(reference decodes via torchaudio, ha/data.py:56-63).
"""

import numpy as np
import pytest

from haloop_tpu.native import decode_flac, flac_library


class BitWriter:
    def __init__(self):
        self.bits = []

    def write(self, value, n):
        for i in range(n - 1, -1, -1):
            self.bits.append((int(value) >> i) & 1)

    def write_signed(self, value, n):
        self.write(int(value) & ((1 << n) - 1), n)

    def align(self):
        while len(self.bits) % 8:
            self.bits.append(0)

    def bytes(self):
        assert len(self.bits) % 8 == 0
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            b = 0
            for bit in self.bits[i:i + 8]:
                b = (b << 1) | bit
            out.append(b)
        return bytes(out)


def crc8(data):
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1)
    return crc & 0xFF


def crc16(data):
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 \
                else (crc << 1) & 0xFFFF
    return crc


def zigzag(v):
    return (v << 1) if v >= 0 else (-(v << 1) - 1)


def write_subframe(w, samples, bps, mode):
    w.write(0, 1)
    if mode == "verbatim":
        w.write(0b000001, 6)
        w.write(0, 1)
        for s in samples:
            w.write_signed(s, bps)
    elif mode == "constant":
        assert len(set(samples.tolist())) == 1
        w.write(0b000000, 6)
        w.write(0, 1)
        w.write_signed(samples[0], bps)
    elif mode == "fixed2":
        w.write(0b001010, 6)          # FIXED, order 2
        w.write(0, 1)
        w.write_signed(samples[0], bps)
        w.write_signed(samples[1], bps)
        resid = [int(samples[i]) - 2 * int(samples[i - 1])
                 + int(samples[i - 2]) for i in range(2, len(samples))]
        w.write(0b00, 2)              # 4-bit rice method
        w.write(0, 4)                 # partition order 0
        p = 14
        w.write(p, 4)
        for r in resid:
            u = zigzag(r)
            q = u >> p
            for _ in range(q):
                w.write(0, 1)
            w.write(1, 1)
            w.write(u & ((1 << p) - 1), p)
    else:
        raise ValueError(mode)


def encode_flac(channels, rate=16000, bps=16, blocksize=256,
                mode="verbatim"):
    """channels: int array (C, N)."""
    C, N = channels.shape
    out = bytearray(b"fLaC")
    si = BitWriter()
    si.write(blocksize, 16)
    si.write(blocksize, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(rate, 20)
    si.write(C - 1, 3)
    si.write(bps - 1, 5)
    si.write(N, 36)
    for _ in range(16):
        si.write(0, 8)
    body = si.bytes()
    out += bytes([0x80]) + len(body).to_bytes(3, "big") + body

    for fi, start in enumerate(range(0, N, blocksize)):
        block = channels[:, start:start + blocksize]
        bs = block.shape[1]
        h = BitWriter()
        h.write(0x3FFE, 14)
        h.write(0, 1)
        h.write(0, 1)                 # fixed blocksize strategy
        h.write(7, 4)                 # 16-bit blocksize-1 follows
        h.write(0, 4)                 # rate from STREAMINFO
        h.write(C - 1, 4)             # independent channels
        h.write({8: 1, 12: 2, 16: 4, 20: 5, 24: 6}[bps], 3)
        h.write(0, 1)
        assert fi < 128
        h.write(fi, 8)                # utf8 frame number (single byte)
        h.write(bs - 1, 16)
        header = h.bytes()
        f = BitWriter()
        for byte in header:
            f.write(byte, 8)
        f.write(crc8(header), 8)
        for c in range(C):
            write_subframe(f, block[c], bps, mode)
        f.align()
        frame = f.bytes()
        out += frame + crc16(frame).to_bytes(2, "big")
    return bytes(out)


pytestmark = pytest.mark.skipif(flac_library() is None,
                                reason="no C compiler")


def test_verbatim_mono_roundtrip():
    rng = np.random.default_rng(0)
    x = rng.integers(-2 ** 15, 2 ** 15, 1000, dtype=np.int64)[None]
    data = encode_flac(x, rate=22050, mode="verbatim")
    frames, sr, bps = decode_flac(data)
    assert sr == 22050 and bps == 16
    np.testing.assert_array_equal(frames, x)


def test_fixed2_rice_roundtrip():
    rng = np.random.default_rng(1)
    x = np.cumsum(rng.integers(-50, 50, 700), dtype=np.int64)
    x = np.clip(x, -30000, 30000)[None]
    data = encode_flac(x, mode="fixed2", blocksize=200)
    frames, sr, bps = decode_flac(data)
    np.testing.assert_array_equal(frames, x)


def test_constant_subframe():
    x = np.full((1, 512), -1234, np.int64)
    data = encode_flac(x, mode="constant", blocksize=512)
    frames, _, _ = decode_flac(data)
    np.testing.assert_array_equal(frames, x)


def test_stereo_roundtrip():
    rng = np.random.default_rng(2)
    x = rng.integers(-2 ** 15, 2 ** 15, (2, 300), dtype=np.int64)
    data = encode_flac(x, mode="verbatim", blocksize=128)
    frames, _, _ = decode_flac(data)
    np.testing.assert_array_equal(frames, x)


def test_load_audio_flac(tmp_path):
    from haloop_tpu.data import load_audio
    rng = np.random.default_rng(3)
    x = np.cumsum(rng.integers(-80, 80, 3200), dtype=np.int64)
    x = np.clip(x, -32000, 32000)[None]
    path = tmp_path / "utt.flac"
    path.write_bytes(encode_flac(x, rate=16000, mode="fixed2"))
    wav, sr = load_audio(path)
    assert sr == 16000 and wav.dtype == np.float32
    np.testing.assert_allclose(wav, x.astype(np.float32) / 32768.0)
    assert np.abs(wav).max() <= 1.0


def _libsndfile():
    """pygame vendors libsndfile+libFLAC; use them as a real-encoder
    oracle when present."""
    import ctypes
    import glob
    d = glob.glob("/opt/venv/lib/python3.12/site-packages/pygame.libs/")
    if not d:
        return None
    for name in ("libogg", "libvorbis-", "libvorbisenc", "libFLAC",
                 "libopus", "libmpg123", "libvorbisfile"):
        for p in glob.glob(d[0] + name + "*"):
            try:
                ctypes.CDLL(p, mode=ctypes.RTLD_GLOBAL)
            except OSError:
                pass
    libs = glob.glob(d[0] + "libsndfile*")
    if not libs:
        return None
    try:
        return ctypes.CDLL(libs[0])
    except OSError:
        return None


def test_real_libflac_oracle(tmp_path):
    """Decode a stream produced by the actual libFLAC encoder (LPC
    subframes, real rice partitions) bit-exactly."""
    import ctypes
    sf = _libsndfile()
    if sf is None:
        pytest.skip("no vendored libsndfile")

    class SF_INFO(ctypes.Structure):
        _fields_ = [("frames", ctypes.c_int64),
                    ("samplerate", ctypes.c_int),
                    ("channels", ctypes.c_int), ("format", ctypes.c_int),
                    ("sections", ctypes.c_int), ("seekable", ctypes.c_int)]

    sf.sf_open.restype = ctypes.c_void_p
    sf.sf_open.argtypes = [ctypes.c_char_p, ctypes.c_int,
                           ctypes.POINTER(SF_INFO)]
    sf.sf_writef_short.restype = ctypes.c_int64
    sf.sf_writef_short.argtypes = [ctypes.c_void_p,
                                   ctypes.POINTER(ctypes.c_int16),
                                   ctypes.c_int64]
    sf.sf_close.argtypes = [ctypes.c_void_p]

    for seed, ch in ((0, 1), (1, 2)):
        rng = np.random.default_rng(seed)
        x = np.clip(np.cumsum(rng.integers(-300, 300, (48000, ch)), axis=0),
                    -32000, 32000).astype(np.int16)
        info = SF_INFO(0, 16000, ch, 0x170000 | 0x0002, 0, 0)  # FLAC|PCM16
        path = str(tmp_path / f"oracle{ch}.flac").encode()
        h = sf.sf_open(path, 0x20, ctypes.byref(info))
        assert h
        sf.sf_writef_short(h, np.ascontiguousarray(x).ctypes.data_as(
            ctypes.POINTER(ctypes.c_int16)), len(x))
        sf.sf_close(h)
        frames, sr, bps = decode_flac(open(path, "rb").read())
        assert (sr, bps) == (16000, 16)
        np.testing.assert_array_equal(frames.T, x.astype(np.int32))


def test_decoder_survives_fuzzed_streams():
    """Robustness of the C decoder: randomly corrupted FLAC bytes must
    raise a clean Python error or decode to SOMETHING — never crash the
    process (a segfault in the data loader kills training). Runs in a
    subprocess so a crash fails the test instead of taking pytest down."""
    import subprocess
    import sys
    import textwrap
    from pathlib import Path

    x = (np.sin(np.arange(512) * 0.02) * 2000).astype(np.int64)[None]
    data = bytearray(encode_flac(x, mode="fixed2", blocksize=128))

    driver = textwrap.dedent("""
        import sys
        sys.path.insert(0, %r)
        import numpy as np
        from haloop_tpu.native import decode_flac
        data = bytearray(open(sys.argv[1], 'rb').read())
        rng = np.random.default_rng(0)
        ok = bad = 0
        for trial in range(400):
            buf = bytearray(data)
            for _ in range(int(rng.integers(1, 8))):
                buf[int(rng.integers(0, len(buf)))] = int(
                    rng.integers(0, 256))
            # also try truncations
            if trial %% 5 == 0:
                buf = buf[:int(rng.integers(4, len(buf)))]
            try:
                frames, sr, bps = decode_flac(bytes(buf))
                assert np.isfinite(np.asarray(frames, np.float64)).all()
                ok += 1
            except Exception:
                bad += 1
        print("FUZZ-OK", ok, bad)
    """) % str(Path(__file__).parent.parent)

    import tempfile
    with tempfile.NamedTemporaryFile(suffix=".flac", delete=False) as f:
        f.write(bytes(data))
        path = f.name
    r = subprocess.run([sys.executable, "-c", driver, path],
                       capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, f"decoder crashed: rc={r.returncode}\n" \
                              f"{r.stdout}\n{r.stderr[-2000:]}"
    assert "FUZZ-OK" in r.stdout, r.stdout
