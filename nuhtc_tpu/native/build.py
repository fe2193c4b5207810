"""Build + load the native C library (ctypes) with on-first-use compilation.

The compiled .so is cached next to the source; rebuilt when the source is
newer. Falls back to None (callers use the numpy path) if no compiler.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "rle.c")
_SO = os.path.join(_DIR, "librle.so")

_lib = None
_tried = False


def _compile() -> bool:
    for cc in ("cc", "gcc", "g++", "clang"):
        try:
            r = subprocess.run(
                [cc, "-O2", "-shared", "-fPIC", _SRC, "-o", _SO],
                capture_output=True,
                timeout=120,
            )
            if r.returncode == 0:
                return True
        except (FileNotFoundError, subprocess.TimeoutExpired):
            continue
    return False


def load_librle():
    """Returns the ctypes lib with configured signatures, or None."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
        if not _compile():
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None

    u8p = ctypes.POINTER(ctypes.c_uint8)
    u32p = ctypes.POINTER(ctypes.c_uint32)
    i64p = ctypes.POINTER(ctypes.c_int64)
    f64p = ctypes.POINTER(ctypes.c_double)
    chp = ctypes.c_char_p
    i64 = ctypes.c_int64

    lib.rle_encode.restype = i64
    lib.rle_encode.argtypes = [u8p, i64, i64, u32p, i64]
    lib.rle_decode.restype = None
    lib.rle_decode.argtypes = [u32p, i64, u8p, i64]
    lib.rle_area.restype = ctypes.c_uint64
    lib.rle_area.argtypes = [u32p, i64]
    lib.rle_bbox.restype = None
    lib.rle_bbox.argtypes = [u32p, i64, i64, f64p]
    lib.rle_iou.restype = None
    lib.rle_iou.argtypes = [u32p, i64p, i64p, i64, u32p, i64p, i64p, i64, u8p, f64p]
    lib.rle_string_encode.restype = i64
    lib.rle_string_encode.argtypes = [u32p, i64, ctypes.c_char_p, i64]
    lib.rle_string_decode.restype = i64
    lib.rle_string_decode.argtypes = [chp, i64, u32p, i64]

    _lib = lib
    return _lib
