"""ctypes bindings for the native C++ host engine (libhnswhost.so).

Plays the role the reference's ctypes layer plays over its NativeAOT
library (bindings/bindings.py:44-128): ABI declaration, lazy library
loading (with on-demand compilation from source if the .so is missing),
last-error retrieval, and a `HostIndex` class mirroring `Index`.

Use cases: CPU serving without a TPU, and an independent oracle for
parity-testing the TPU wave-construction path (see
tests/test_host_engine.py)."""

from __future__ import annotations

import ctypes as ct
import subprocess
from pathlib import Path
from typing import List, Tuple

import numpy as np

_DIR = Path(__file__).resolve().parent
_LIB_PATH = _DIR / "libhnswhost.so"
_lib = None


def _build_lib() -> None:
    src = _DIR / "hnsw_host.cpp"
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
           "-std=c++17", "-o", str(_LIB_PATH), str(src), "-lpthread"]
    subprocess.run(cmd, check=True, capture_output=True)


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists():
        _build_lib()
    lib = ct.CDLL(str(_LIB_PATH))

    lib.hnsw_create.restype = ct.c_void_p
    lib.hnsw_create.argtypes = [ct.c_char_p]
    lib.hnsw_free.restype = None
    lib.hnsw_free.argtypes = [ct.c_void_p]
    lib.hnsw_add.restype = ct.c_int
    lib.hnsw_add.argtypes = [ct.c_void_p, ct.POINTER(ct.c_float), ct.c_int,
                             ct.c_int, ct.POINTER(ct.c_int)]
    lib.hnsw_remove.restype = ct.c_int
    lib.hnsw_remove.argtypes = [ct.c_void_p, ct.POINTER(ct.c_int), ct.c_int]
    lib.hnsw_knn_query.restype = ct.c_int
    lib.hnsw_knn_query.argtypes = [ct.c_void_p, ct.POINTER(ct.c_float),
                                   ct.c_int, ct.c_int, ct.c_int,
                                   ct.POINTER(ct.c_int),
                                   ct.POINTER(ct.c_float)]
    lib.hnsw_range_query.restype = ct.c_int
    lib.hnsw_range_query.argtypes = [ct.c_void_p, ct.POINTER(ct.c_float),
                                     ct.c_int, ct.c_int, ct.c_float,
                                     ct.POINTER(ct.c_void_p),
                                     ct.POINTER(ct.c_void_p),
                                     ct.POINTER(ct.c_int)]
    lib.hnsw_free_results.restype = None
    lib.hnsw_free_results.argtypes = [ct.POINTER(ct.c_void_p),
                                      ct.POINTER(ct.c_void_p), ct.c_int]
    for name, argt in [("hnsw_set_collection_size", ct.c_int),
                       ("hnsw_set_max_edges", ct.c_int),
                       ("hnsw_set_max_candidates", ct.c_int),
                       ("hnsw_set_remove_max_candidates", ct.c_int),
                       ("hnsw_set_distribution_rate", ct.c_float),
                       ("hnsw_set_random_seed", ct.c_int),
                       ("hnsw_set_min_nn", ct.c_int),
                       ("hnsw_set_allow_removals", ct.c_bool)]:
        fn = getattr(lib, name)
        fn.restype = ct.c_int
        fn.argtypes = [argt]
    lib.hnsw_get_last_error_utf8.restype = ct.c_int
    lib.hnsw_get_last_error_utf8.argtypes = [ct.c_void_p, ct.c_int]
    lib.hnsw_count.restype = ct.c_int
    lib.hnsw_count.argtypes = [ct.c_void_p]
    lib.hnsw_serialize.restype = ct.c_int
    lib.hnsw_serialize.argtypes = [ct.c_void_p, ct.c_char_p]
    lib.hnsw_deserialize.restype = ct.c_void_p
    lib.hnsw_deserialize.argtypes = [ct.c_char_p]
    _lib = lib
    return lib


def _last_error(lib) -> str:
    n = lib.hnsw_get_last_error_utf8(None, 0)
    if n <= 0:
        return ""
    buf = ct.create_string_buffer(n + 1)
    lib.hnsw_get_last_error_utf8(buf, len(buf))
    return buf.value.decode("utf-8")


def _as_2d_f32(x, dim=None) -> np.ndarray:
    a = np.asarray(x, dtype=np.float32)
    if a.ndim == 1:
        a = a.reshape(1, -1)
    if a.ndim != 2:
        raise ValueError("expected 2D (n, dim) or 1D vector")
    if dim is not None and a.shape[1] != dim:
        raise ValueError(f"expected dim={dim}, got {a.shape[1]}")
    return np.ascontiguousarray(a)


class HostIndex:
    """Native CPU engine with the reference bindings' Index interface."""

    def __init__(self, dim: int, metric: str = "sq_euclid"):
        self.dim = int(dim)
        self.metric = metric
        self._lib = _load()
        self._h = None
        self._initialized = False
        self._staged = []

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.hnsw_free(self._h)
            self._h = None

    def _require_uninitialized(self):
        if self._initialized:
            raise RuntimeError("setters must precede the first add")

    def _set(self, name, value):
        self._require_uninitialized()
        rc = getattr(self._lib, name)(value)
        if rc < 0:
            raise RuntimeError(_last_error(self._lib))

    def set_collection_size(self, v):
        self._set("hnsw_set_collection_size", int(v))

    def set_max_edges(self, v):
        self._set("hnsw_set_max_edges", int(v))

    def set_max_candidates(self, v):
        self._set("hnsw_set_max_candidates", int(v))

    def set_remove_max_candidates(self, v):
        self._set("hnsw_set_remove_max_candidates", int(v))

    def set_distribution_rate(self, v):
        self._set("hnsw_set_distribution_rate", float(v))

    def set_random_seed(self, v):
        self._set("hnsw_set_random_seed", int(v))

    def set_min_nn(self, v):
        self._set("hnsw_set_min_nn", int(v))

    def set_allow_removals(self, v):
        self._set("hnsw_set_allow_removals", bool(v))

    def _initialize(self):
        h = self._lib.hnsw_create(self.metric.encode())
        if not h:
            raise RuntimeError("hnsw_create failed: " +
                               _last_error(self._lib))
        self._h = h
        self._initialized = True

    def add(self, vecs) -> np.ndarray:
        if not self._initialized:
            self._initialize()
        a = _as_2d_f32(vecs, self.dim)
        n = a.shape[0]
        out = np.empty(n, np.int32)
        rc = self._lib.hnsw_add(self._h,
                                a.ctypes.data_as(ct.POINTER(ct.c_float)),
                                n, self.dim,
                                out.ctypes.data_as(ct.POINTER(ct.c_int)))
        if rc < 0:
            raise RuntimeError(_last_error(self._lib))
        return out[:rc].copy()

    def remove(self, ids) -> None:
        arr = np.asarray(ids, np.int32).ravel()
        if arr.size == 0:
            return
        rc = self._lib.hnsw_remove(
            self._h, arr.ctypes.data_as(ct.POINTER(ct.c_int)),
            int(arr.size))
        if rc < 0:
            raise RuntimeError(_last_error(self._lib))

    def knn_query(self, queries, k: int) -> Tuple[np.ndarray, np.ndarray]:
        q = _as_2d_f32(queries, self.dim)
        n = q.shape[0]
        ids = np.empty((n, k), np.int32)
        dists = np.empty((n, k), np.float32)
        rc = self._lib.hnsw_knn_query(
            self._h, q.ctypes.data_as(ct.POINTER(ct.c_float)), n, self.dim,
            k, ids.ctypes.data_as(ct.POINTER(ct.c_int)),
            dists.ctypes.data_as(ct.POINTER(ct.c_float)))
        if rc < 0:
            raise RuntimeError(_last_error(self._lib))
        return ids, dists

    def range_query(self, queries, radius: float
                    ) -> Tuple[List[np.ndarray], List[np.ndarray]]:
        q = _as_2d_f32(queries, self.dim)
        n = q.shape[0]
        ids_pp = (ct.c_void_p * n)()
        d_pp = (ct.c_void_p * n)()
        counts = (ct.c_int * n)()
        rc = self._lib.hnsw_range_query(
            self._h, q.ctypes.data_as(ct.POINTER(ct.c_float)), n, self.dim,
            float(radius), ids_pp, d_pp, counts)
        if rc < 0:
            raise RuntimeError(_last_error(self._lib))
        ids, dists = [], []
        try:
            for i in range(n):
                m = counts[i]
                if m == 0:
                    ids.append(np.empty(0, np.int32))
                    dists.append(np.empty(0, np.float32))
                    continue
                pi = ct.cast(ids_pp[i], ct.POINTER(ct.c_int))
                pd = ct.cast(d_pp[i], ct.POINTER(ct.c_float))
                ids.append(np.ctypeslib.as_array(pi, shape=(m,)).copy())
                dists.append(np.ctypeslib.as_array(pd, shape=(m,)).copy())
        finally:
            self._lib.hnsw_free_results(ids_pp, d_pp, n)
        return ids, dists

    @property
    def count(self) -> int:
        return 0 if self._h is None else self._lib.hnsw_count(self._h)

    def serialize(self, path: str) -> None:
        rc = self._lib.hnsw_serialize(self._h, str(path).encode())
        if rc < 0:
            raise RuntimeError(_last_error(self._lib))

    @classmethod
    def deserialize(cls, path: str, dim: int, metric: str = "sq_euclid"
                    ) -> "HostIndex":
        lib = _load()
        h = lib.hnsw_deserialize(str(path).encode())
        if not h:
            raise RuntimeError(_last_error(lib))
        idx = cls(dim, metric)
        idx._h = h
        idx._initialized = True
        return idx
