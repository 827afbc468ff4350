"""Native (C++) runtime components with transparent NumPy fallback.

The shared library is built on demand with g++ the first time it is needed
(and cached next to the source); every entry point has a pure-NumPy fallback
so the package works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_HERE, "libgsm_native.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    src = os.path.join(_HERE, "gsm_native.cpp")
    try:
        subprocess.run(
            ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread",
             "-o", _LIB_PATH, src],
            check=True, capture_output=True, timeout=300)
        return True
    except (OSError, subprocess.SubprocessError):
        return False


def get_lib():
    """Load (building if necessary) the native library, or None."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB_PATH) and not _build():
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None

        i64, i32 = ctypes.c_int64, ctypes.c_int32
        fp = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
        u32p = np.ctypeslib.ndpointer(np.uint32, flags="C_CONTIGUOUS")
        i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")

        lib.ply_decode_standard.restype = i64
        lib.ply_decode_standard.argtypes = (
            [u8p, i64, i64] + [i32] * 16 + [i32] * 3 + [fp] * 5)
        lib.ply_decode_compressed.restype = None
        lib.ply_decode_compressed.argtypes = [fp, i64, u32p, i64] + [fp] * 5
        lib.morton_sort_indices.restype = None
        lib.morton_sort_indices.argtypes = [fp, i64, i64p]
        _lib = lib
        return _lib


def morton_sort_indices(positions: np.ndarray) -> np.ndarray | None:
    """Native Morton argsort; None if the library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    pos = np.ascontiguousarray(positions, np.float32)
    order = np.empty(pos.shape[0], np.int64)
    lib.morton_sort_indices(pos, pos.shape[0], order)
    return order
