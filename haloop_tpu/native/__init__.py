"""Native (C) runtime components, loaded via ctypes with lazy
compilation: the shared object is built once with the system compiler
into this package directory (no pip/pybind needed). Callers fall back to
pure python when no compiler is available.
"""

import ctypes
import subprocess
import sys
from pathlib import Path

_HERE = Path(__file__).resolve().parent
_LIB = None
_TRIED = False


def _build():
    src = _HERE / "levenshtein.c"
    so = _HERE / "libhalev.so"
    if so.exists() and so.stat().st_mtime >= src.stat().st_mtime:
        return so
    for cc in ("cc", "gcc", "clang"):
        try:
            subprocess.run([cc, "-O3", "-shared", "-fPIC", "-o", str(so),
                            str(src)], check=True, capture_output=True)
            return so
        except (FileNotFoundError, subprocess.CalledProcessError):
            continue
    return None


_FLAC = None
_FLAC_TRIED = False


def _build_one(src_name, so_name):
    src = _HERE / src_name
    so = _HERE / so_name
    if so.exists() and so.stat().st_mtime >= src.stat().st_mtime:
        return so
    for cc in ("cc", "gcc", "clang"):
        try:
            subprocess.run([cc, "-O3", "-shared", "-fPIC", "-o", str(so),
                            str(src)], check=True, capture_output=True)
            return so
        except (FileNotFoundError, subprocess.CalledProcessError):
            continue
    return None


def flac_library():
    """ctypes handle to the native FLAC decoder, or None."""
    global _FLAC, _FLAC_TRIED
    if _FLAC_TRIED:
        return _FLAC
    _FLAC_TRIED = True
    try:
        so = _build_one("flac.c", "libhaflac.so")
        if so is None:
            return None
        lib = ctypes.CDLL(str(so))
        lib.flac_streaminfo.restype = ctypes.c_int
        lib.flac_streaminfo.argtypes = [
            ctypes.c_char_p, ctypes.c_longlong,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_longlong)]
        lib.flac_decode.restype = ctypes.c_longlong
        lib.flac_decode.argtypes = [
            ctypes.c_char_p, ctypes.c_longlong,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_longlong,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int)]
        _FLAC = lib
    except Exception as e:
        print(f"haloop_tpu.native: flac decoder unavailable ({e})",
              file=sys.stderr)
        _FLAC = None
    return _FLAC


def decode_flac(data):
    """Decode a FLAC byte string -> (int32 array (channels, frames),
    sample_rate, bits_per_sample). Raises on malformed input or when no
    C compiler is available to build the decoder."""
    import ctypes as ct

    import numpy as np

    lib = flac_library()
    if lib is None:
        raise RuntimeError("native FLAC decoder unavailable (no compiler)")
    ch = ct.c_int()
    rate = ct.c_int()
    bps = ct.c_int()
    total = ct.c_longlong()
    if lib.flac_streaminfo(data, len(data), ct.byref(ch), ct.byref(rate),
                           ct.byref(bps), ct.byref(total)):
        raise ValueError("not a FLAC stream (bad STREAMINFO)")
    capacity = total.value if total.value > 0 else len(data) * 4
    out = np.empty(capacity * ch.value, np.int32)
    n = lib.flac_decode(data, len(data),
                        out.ctypes.data_as(ct.POINTER(ct.c_int32)),
                        capacity, ct.byref(ch), ct.byref(rate),
                        ct.byref(bps))
    if n < 0:
        raise ValueError(f"FLAC decode failed (rc={n})")
    frames = out[:n * ch.value].reshape(-1, ch.value).T
    return frames, rate.value, bps.value


def library():
    """ctypes handle to the native library, or None."""
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    try:
        so = _build()
        if so is None:
            return None
        lib = ctypes.CDLL(str(so))
        lib.edit_distance_i32.restype = ctypes.c_int
        lib.edit_distance_i32.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32)]
        lib.align_i32.restype = ctypes.c_int
        lib.align_i32.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32)]
        _LIB = lib
    except Exception as e:
        print(f"haloop_tpu.native: falling back to python ({e})",
              file=sys.stderr)
        _LIB = None
    return _LIB
