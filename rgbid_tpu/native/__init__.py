"""Native C++ runtime components (ctypes bindings).

The reference's host runtime is C++ (Eigen pose graph, DBoW2 feature
scoring — SURVEY.md §2.1); this package provides the equivalent native
kernels for the rebuild: pose-graph normal-system assembly (the O(E)
small-matrix hot loop) and batched Hamming descriptor distances. Python
implementations remain as tested fallbacks and oracles
(backend/pose_graph.py, backend/place_recognition.py).

The shared library is built on demand with g++ (no pybind11 in this
environment; plain C ABI + ctypes). If no toolchain is available the
package degrades gracefully: ``available()`` returns False and callers
use the numpy paths.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "pose_graph.cpp")
_LIB = os.path.join(_DIR, "libslamnative.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-o", _LIB, _SRC],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception:
        return False


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            return None
        d = ctypes.c_double
        i = ctypes.c_int
        pd = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
        pi = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        pu8 = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
        pint = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        lib.pg_build_system.restype = d
        lib.pg_build_system.argtypes = [pd, i, pi, pi, pd, pd, pu8, i, d, pd, pd]
        lib.pg_total_error.restype = d
        lib.pg_total_error.argtypes = [pd, i, pi, pi, pd, pd, i]
        lib.pg_apply_updates.restype = None
        lib.pg_apply_updates.argtypes = [pd, i, pd, pu8]
        lib.hamming_batch.restype = None
        lib.hamming_batch.argtypes = [pu8, i, pu8, i, i, pint]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


# ---------------------------------------------------------------------------
# numpy-facing wrappers


def pg_build_system(poses, e_from, e_to, e_T, e_info, e_robust, huber_delta):
    """Returns (H (6N,6N), b (6N,), robust_total_error)."""
    lib = _load()
    assert lib is not None
    n = len(poses)
    dim = 6 * n
    poses_c = np.ascontiguousarray(np.stack(poses).reshape(n, 16), np.float64)
    H = np.zeros((dim, dim), np.float64)
    b = np.zeros(dim, np.float64)
    err = lib.pg_build_system(
        poses_c.reshape(-1),
        n,
        np.ascontiguousarray(e_from, np.int32),
        np.ascontiguousarray(e_to, np.int32),
        np.ascontiguousarray(e_T, np.float64).reshape(-1),
        np.ascontiguousarray(e_info, np.float64).reshape(-1),
        np.ascontiguousarray(e_robust, np.uint8),
        len(e_from),
        float(huber_delta),
        H.reshape(-1),
        b,
    )
    return H, b, float(err)


def pg_total_error(poses, e_from, e_to, e_T, e_info):
    lib = _load()
    assert lib is not None
    n = len(poses)
    poses_c = np.ascontiguousarray(np.stack(poses).reshape(n, 16), np.float64)
    return float(
        lib.pg_total_error(
            poses_c.reshape(-1),
            n,
            np.ascontiguousarray(e_from, np.int32),
            np.ascontiguousarray(e_to, np.int32),
            np.ascontiguousarray(e_T, np.float64).reshape(-1),
            np.ascontiguousarray(e_info, np.float64).reshape(-1),
            len(e_from),
        )
    )


def pg_apply_updates(poses, delta, fixed_mask):
    lib = _load()
    assert lib is not None
    n = len(poses)
    poses_c = np.ascontiguousarray(np.stack(poses).reshape(n, 16), np.float64)
    lib.pg_apply_updates(
        poses_c.reshape(-1),
        n,
        np.ascontiguousarray(delta, np.float64),
        np.ascontiguousarray(fixed_mask, np.uint8),
    )
    return [poses_c[i].reshape(4, 4).copy() for i in range(n)]


def hamming_batch(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    lib = _load()
    assert lib is not None
    a = np.ascontiguousarray(a, np.uint8)
    b = np.ascontiguousarray(b, np.uint8)
    out = np.zeros((len(a), len(b)), np.int32)
    if len(a) and len(b):
        lib.hamming_batch(a, len(a), b, len(b), a.shape[1], out)
    return out
