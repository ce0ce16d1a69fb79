"""Native host ops: C++ hot loops with ctypes bindings and NumPy fallbacks.

Compiled lazily on first use (g++ -O3); if no toolchain is available, pure
NumPy fallbacks keep everything working at reduced host speed. The covered
operations are exactly the ones the reference implements natively on host:
popcount Hamming distances, the medoid-descriptor scan, y-sorted radius
search, and the seeded unique-random-index arrays.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import sys
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "hostops.cpp")
_LIB_PATH = os.path.join(_HERE, "libhostops.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> Optional[str]:
    flags = ["-O3", "-shared", "-fPIC", "-std=c++17"]
    # -march=native when permitted; harmless to drop
    for extra in (["-march=native"], []):
        cmd = ["g++", *flags, *extra, _SRC, "-o", _LIB_PATH]
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
            return _LIB_PATH
        except (subprocess.CalledProcessError, FileNotFoundError,
                subprocess.TimeoutExpired):
            continue
    return None


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        path = _LIB_PATH if os.path.exists(_LIB_PATH) else _build()
        if path is None:
            return None
        try:
            lib = ctypes.CDLL(path)
        except OSError:
            return None
        u32p = np.ctypeslib.ndpointer(np.uint32, flags="C_CONTIGUOUS")
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        lib.hamming_matrix.argtypes = [u32p, ctypes.c_int64, u32p,
                                       ctypes.c_int64, i32p]
        lib.hamming_row.argtypes = [u32p, u32p, ctypes.c_int64, i32p]
        lib.medoid_descriptor.argtypes = [u32p, ctypes.c_int64]
        lib.medoid_descriptor.restype = ctypes.c_int64
        lib.radius_search.argtypes = [f32p, f32p, ctypes.c_int64,
                                      ctypes.c_float, ctypes.c_float,
                                      ctypes.c_float, i64p]
        lib.radius_search.restype = ctypes.c_int64
        lib.seed_random.argtypes = [ctypes.c_uint32]
        lib.create_random_array.argtypes = [ctypes.c_int64, ctypes.c_int32,
                                            ctypes.c_int32, i32p]
        _lib = lib
        return _lib


def available() -> bool:
    return get_lib() is not None


# ---------------------------------------------------------------------------
# public wrappers (native when possible, NumPy otherwise)
# ---------------------------------------------------------------------------


def hamming_matrix(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    a = np.ascontiguousarray(a, np.uint32)
    b = np.ascontiguousarray(b, np.uint32)
    lib = get_lib()
    if lib is not None:
        out = np.empty((len(a), len(b)), np.int32)
        lib.hamming_matrix(a, len(a), b, len(b), out)
        return out
    from slam_tpu.ops.hamming import hamming_matrix_host
    return hamming_matrix_host(a, b)


def hamming_row(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    a = np.ascontiguousarray(a, np.uint32).reshape(8)
    b = np.ascontiguousarray(b, np.uint32)
    lib = get_lib()
    if lib is not None:
        out = np.empty(len(b), np.int32)
        lib.hamming_row(a, b, len(b), out)
        return out
    from slam_tpu.ops.hamming import hamming_matrix_host
    return hamming_matrix_host(a[None], b)[0]


def medoid_descriptor(descs: np.ndarray) -> int:
    """Index of the descriptor with the smallest median Hamming distance
    (reference: map_point.cpp:75-116, first index wins ties)."""
    descs = np.ascontiguousarray(descs, np.uint32)
    n = len(descs)
    if n == 0:
        return -1
    lib = get_lib()
    if lib is not None:
        return int(lib.medoid_descriptor(descs, n))
    from slam_tpu.ops.hamming import hamming_matrix_host
    dist = hamming_matrix_host(descs, descs)
    medians = np.sort(dist, axis=1)[:, int(0.5 * (n - 1))]
    return int(np.argmin(medians))


def radius_search(xs_sorted: np.ndarray, ys_sorted: np.ndarray,
                  qx: float, qy: float, r: float) -> np.ndarray:
    """Hit indices into the y-sorted arrays (strict circle test)."""
    lib = get_lib()
    n = len(ys_sorted)
    if lib is not None and n:
        xs = np.ascontiguousarray(xs_sorted, np.float32)
        ys = np.ascontiguousarray(ys_sorted, np.float32)
        out = np.empty(n, np.int64)
        cnt = lib.radius_search(xs, ys, n, np.float32(qx), np.float32(qy),
                                np.float32(r), out)
        return out[:cnt]
    lo = np.searchsorted(ys_sorted, qy - r, side="left")
    hi = np.searchsorted(ys_sorted, qy + r, side="right")
    dx = qx - xs_sorted[lo:hi]
    dy = qy - ys_sorted[lo:hi]
    return lo + np.where(dx * dx + dy * dy < r * r)[0]


def create_random_array(n: int, lo: int, hi: int,
                        seed: Optional[int] = None) -> np.ndarray:
    """n unique random ints in [lo, hi] from a deterministic MT19937 stream
    (reference: openvslam/random_array.cc:21-62, seed 94235682)."""
    lib = get_lib()
    if lib is not None:
        if seed is not None:
            lib.seed_random(np.uint32(seed))
        out = np.empty(n, np.int32)
        lib.create_random_array(n, np.int32(lo), np.int32(hi), out)
        return out
    rng = np.random.default_rng(94235682 if seed is None else seed)
    return rng.choice(np.arange(lo, hi + 1), size=n, replace=False).astype(np.int32)
