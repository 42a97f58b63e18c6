"""ctypes bindings for the native (C++) k-mer enumeration/counting kernel.

The reference implements this stage as a Python ``itertools.combinations`` loop
fanned out over a process pool (ref: Code/generate_kmers.py:100-132).  Here the
hot loop is a multithreaded C++ kernel (open-addressing hash count) built from
``matcha_tpu/native/kmer_count.cpp``; the numpy path in data/kmers.py is the
fallback when the shared library is missing.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO_PATH = os.path.join(_HERE, "libmatcha_native.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _try_build() -> bool:
    src = os.path.join(_HERE, "kmer_count.cpp")
    if not os.path.exists(src):
        return False
    cmd = ["g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
           "-fopenmp", "-o", _SO_PATH, src]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=300)
        return True
    except Exception:
        # retry without OpenMP in case libgomp is unavailable
        try:
            cmd = ["g++", "-O3", "-march=native", "-std=c++17", "-shared",
                   "-fPIC", "-o", _SO_PATH, src]
            subprocess.run(cmd, check=True, capture_output=True, timeout=300)
            return True
        except Exception:
            return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        if not os.path.exists(_SO_PATH) and not _try_build():
            _build_failed = True
            return None
        try:
            lib = ctypes.CDLL(_SO_PATH)
        except OSError:
            _build_failed = True
            return None
        lib.matcha_count_kmers.restype = ctypes.c_int64
        lib.matcha_count_kmers.argtypes = [
            ctypes.POINTER(ctypes.c_int32),   # flat members
            ctypes.POINTER(ctypes.c_int64),   # offsets
            ctypes.c_int64,                   # num clusters
            ctypes.c_int32,                   # k
            ctypes.c_int32,                   # max_cluster_size
            ctypes.c_int32,                   # min_distance
            ctypes.POINTER(ctypes.c_void_p),  # out handle
        ]
        lib.matcha_kmer_result_fill.restype = None
        lib.matcha_kmer_result_fill.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_int32),   # out kmers (N*k)
            ctypes.POINTER(ctypes.c_int64),   # out freqs (N)
        ]
        lib.matcha_kmer_result_free.restype = None
        lib.matcha_kmer_result_free.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


MAX_K = 5                 # kmer_count.cpp kMaxK
MAX_NODE_ID = (1 << 25)   # pack() gives each member 25 bits of the key


def supported(k: int, flat) -> bool:
    """True if the native kernel can handle this (k, node-id range) —
    beyond these the packed 128-bit keys would corrupt silently (ids) or
    the kernel rejects (k); callers fall back to the numpy path."""
    import numpy as _np
    return k <= MAX_K and (len(flat) == 0 or int(_np.max(flat)) < MAX_NODE_ID)


def available() -> bool:
    return _load() is not None


def count_kmers(flat: np.ndarray, offsets: np.ndarray, k: int,
                max_cluster_size: int, min_distance: int,
                ) -> Tuple[np.ndarray, np.ndarray]:
    lib = _load()
    assert lib is not None
    flat = np.ascontiguousarray(flat, dtype=np.int32)
    offsets = np.ascontiguousarray(offsets, dtype=np.int64)
    handle = ctypes.c_void_p()
    n = lib.matcha_count_kmers(
        flat.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ctypes.c_int64(len(offsets) - 1),
        ctypes.c_int32(k), ctypes.c_int32(max_cluster_size),
        ctypes.c_int32(min_distance), ctypes.byref(handle))
    if n < 0:
        raise ValueError(f"native kmer kernel rejected k={k} (rc={n}); "
                         "callers should gate on supported(k, flat)")
    kmers = np.empty((n, k), dtype=np.int32)
    freqs = np.empty((n,), dtype=np.int64)
    lib.matcha_kmer_result_fill(
        handle,
        kmers.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        freqs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    lib.matcha_kmer_result_free(handle)
    # already in canonical lexsorted order: the kernel's 128-bit packed keys
    # place v[0] in the most-significant bits and the merged runs are sorted
    # by key, which IS column-0-major lexicographic order (pinned by
    # test_native_kernel_matches_numpy's exact array equality)
    return kmers, freqs
