"""ctypes bindings for the native (C++) .clusters parser.

The reference parses cluster files with a per-line Python loop
(ref: Code/process.py:42-87) — ~1-2 MB/s per core, hours on real 4DN
SPRITE inputs (tens of GB).  ``cluster_parse.cpp`` mmaps the file and
parses newline-aligned byte ranges across threads; the Python path in
data/clusters.py is both the fallback and the correctness oracle
(``tests/test_data.py::test_native_cluster_parser_matches_python``).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO_PATH = os.path.join(_HERE, "libmatcha_cluster.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _try_build() -> bool:
    src = os.path.join(_HERE, "cluster_parse.cpp")
    if not os.path.exists(src):
        return False
    cmd = ["g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
           "-pthread", "-o", _SO_PATH, src]
    try:
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
        lib.matcha_parse_clusters.restype = ctypes.c_int32
        lib.matcha_parse_clusters.argtypes = [
            ctypes.c_char_p,                  # path
            ctypes.c_char_p,                  # chrom name blob
            ctypes.POINTER(ctypes.c_int32),   # chrom name lengths
            ctypes.c_int32,                   # n_chroms
            ctypes.POINTER(ctypes.c_int64),   # first_node per chrom
            ctypes.c_int64,                   # resolution
            ctypes.c_int32,                   # max_cluster_size
            ctypes.c_int32,                   # n_threads
            ctypes.POINTER(ctypes.c_void_p),  # out handle
        ]
        lib.matcha_cluster_result_sizes.restype = None
        lib.matcha_cluster_result_sizes.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64)]
        lib.matcha_cluster_result_fill.restype = None
        lib.matcha_cluster_result_fill.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int64)]
        lib.matcha_cluster_result_free.restype = None
        lib.matcha_cluster_result_free.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def parse_clusters(path: str, genome, max_cluster_size: int,
                   n_threads: Optional[int] = None,
                   ) -> Tuple[np.ndarray, np.ndarray]:
    """Native equivalent of data.clusters.parse_clusters."""
    lib = _load()
    assert lib is not None, "native cluster parser unavailable"
    names = list(genome.chrom_names)
    blob = "".join(names).encode()
    lens = np.asarray([len(n.encode()) for n in names], dtype=np.int32)
    first = np.ascontiguousarray(genome.chrom_range[:, 0], dtype=np.int64)
    if n_threads is None:
        n_threads = min(os.cpu_count() or 1, 16)
    handle = ctypes.c_void_p()
    rc = lib.matcha_parse_clusters(
        path.encode(), blob,
        lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(names),
        first.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        int(genome.resolution), int(max_cluster_size), int(n_threads),
        ctypes.byref(handle))
    if rc == -4:
        raise ValueError(f"malformed coordinate in {path} (matches the "
                         "Python parser's int() ValueError)")
    if rc != 0:
        raise OSError(f"native cluster parse failed: rc={rc} path={path}")
    try:
        n_flat = ctypes.c_int64()
        n_clusters = ctypes.c_int64()
        lib.matcha_cluster_result_sizes(handle, ctypes.byref(n_flat),
                                        ctypes.byref(n_clusters))
        flat = np.empty(n_flat.value, dtype=np.int32)
        offsets = np.empty(n_clusters.value + 1, dtype=np.int64)
        lib.matcha_cluster_result_fill(
            handle, flat.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    finally:
        lib.matcha_cluster_result_free(handle)
    return flat, offsets
