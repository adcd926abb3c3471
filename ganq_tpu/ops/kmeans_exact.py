"""ctypes binding for the exact native weighted 1-D k-means.

Builds ``native/kmeans1d.cpp`` into a shared library on first use (g++ -O3,
cached next to the source) and exposes a batched, thread-pooled codebook
initializer — the drop-in exact alternative (``codebook_init="kmeans_exact"``)
to the on-device Lloyd solver in ``ops/kmeans.py``, matching the reference's
``kmeans1d.cluster`` on a host thread pool (ganq.py:423-438).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_LOCK = threading.Lock()


def _native_dir() -> str:
    return os.path.join(os.path.dirname(os.path.dirname(__file__)), "native")


def _build() -> str:
    src = os.path.join(_native_dir(), "kmeans1d.cpp")
    out = os.path.join(_native_dir(), "libkmeans1d.so")
    if (not os.path.exists(out)
            or os.path.getmtime(out) < os.path.getmtime(src)):
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
             "-o", out, src],
            check=True, capture_output=True)
    return out


def load_lib() -> ctypes.CDLL:
    global _LIB
    with _LOCK:
        if _LIB is None:
            lib = ctypes.CDLL(_build())
            lib.kmeans1d_sorted.restype = ctypes.c_double
            lib.kmeans1d_sorted.argtypes = [
                ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
                ctypes.c_int32, ctypes.c_int32,
                ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_int32)]
            lib.kmeans1d_rows.restype = None
            lib.kmeans1d_rows.argtypes = [
                ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
                ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
                ctypes.POINTER(ctypes.c_double)]
            _LIB = lib
    return _LIB


def kmeans1d(x: np.ndarray, k: int, weights: Optional[np.ndarray] = None):
    """Exact weighted 1-D k-means of one vector. Returns (centroids [k] asc,
    assignments [n])."""
    lib = load_lib()
    x = np.asarray(x, np.float64).reshape(-1)
    n = len(x)
    w = (np.ones(n) if weights is None
         else np.asarray(weights, np.float64).reshape(-1))
    order = np.argsort(x, kind="stable")
    xs = np.ascontiguousarray(x[order])
    ws = np.ascontiguousarray(w[order])
    cents = np.zeros(k, np.float64)
    assign_sorted = np.zeros(n, np.int32)
    lib.kmeans1d_sorted(
        xs.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ws.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        n, k,
        cents.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        assign_sorted.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    assign = np.zeros(n, np.int32)
    assign[order] = assign_sorted
    return cents, assign


def kmeans_rows_exact(X: np.ndarray, weights: np.ndarray, k: int,
                      n_threads: Optional[int] = None) -> np.ndarray:
    """Batched per-row exact k-means with a shared column-weight vector
    (the GANQ codebook init shape). Returns [m, k] ascending centroids."""
    lib = load_lib()
    X = np.ascontiguousarray(np.asarray(X, np.float64))
    w = np.ascontiguousarray(np.asarray(weights, np.float64).reshape(-1))
    m, n = X.shape
    out = np.zeros((m, k), np.float64)
    n_threads = n_threads or min(os.cpu_count() or 1, 16)
    chunk = max(1, -(-m // n_threads))

    def work(r0):
        r1 = min(r0 + chunk, m)
        lib.kmeans1d_rows(
            X[r0:r1].ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            w.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            r1 - r0, n, k,
            out[r0:r1].ctypes.data_as(ctypes.POINTER(ctypes.c_double)))

    with ThreadPoolExecutor(max_workers=n_threads) as ex:
        list(ex.map(work, range(0, m, chunk)))
    return out


__all__ = ["kmeans1d", "kmeans_rows_exact", "load_lib"]
