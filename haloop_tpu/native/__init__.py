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
