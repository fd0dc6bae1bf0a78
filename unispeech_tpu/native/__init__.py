"""ctypes loader for the native host kernels (packer.cpp).

Builds the shared library on demand with g++ (no pybind11 in the image —
SURVEY.md §2.6 plan). All callers degrade to numpy/python fallbacks if the
toolchain is unavailable, so the package works without a compiler.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Sequence

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "packer.cpp")
_SO = os.path.join(_HERE, "_native.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> Optional[str]:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _SO],
            check=True, capture_output=True, timeout=120,
        )
        return _SO
    except Exception:
        return None


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        path = _SO if os.path.exists(_SO) else _build()
        if path is None:
            return None
        try:
            lib = ctypes.CDLL(path)
        except OSError:
            return None
        i64 = ctypes.c_int64
        p64 = ctypes.POINTER(ctypes.c_int64)
        p32 = ctypes.POINTER(ctypes.c_int32)
        lib.batch_by_size_vec.restype = i64
        lib.batch_by_size_vec.argtypes = [p64, i64, i64, i64, i64, p64]
        lib.edit_distance.restype = i64
        lib.edit_distance.argtypes = [p32, i64, p32, i64]
        lib.edit_distance_batch.restype = None
        lib.edit_distance_batch.argtypes = [p32, p64, p64, p32, p64, p64, i64, p64]
        _lib = lib
        return _lib


def batch_by_size_native(
    sizes: np.ndarray, max_tokens: int, max_sentences: int, bsz_mult: int
) -> Optional[List[np.ndarray]]:
    """Batch end-offsets via the C++ packer; None if lib unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    sizes64 = np.ascontiguousarray(sizes, dtype=np.int64)
    ends = np.empty(len(sizes64) + 1, dtype=np.int64)
    n = lib.batch_by_size_vec(
        sizes64.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(sizes64), max_tokens, max_sentences, bsz_mult,
        ends.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    return list(ends[:n])


def edit_distance_native(a: Sequence[int], b: Sequence[int]) -> Optional[int]:
    lib = get_lib()
    if lib is None:
        return None
    aa = np.ascontiguousarray(a, dtype=np.int32)
    bb = np.ascontiguousarray(b, dtype=np.int32)
    return int(
        lib.edit_distance(
            aa.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(aa),
            bb.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(bb),
        )
    )
