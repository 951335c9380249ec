"""`Index` — drop-in replacement for the reference's Python bindings.

Mirrors ``bindings/bindings.py:142-597`` exactly: same constructor
signature, same metric strings ("sq_euclid", "cosine", "ucosine"), same
lazy initialization on first ``add`` (bindings.py:185-198,427-428), same
"setters must precede first add" contract (every setter raises once the
index is initialized, matching the staged-parameters design of
HNSWIndexExports.cs:16,219-273), and the same array shapes/dtypes:

* ``add``        -> int32 ids (bindings.py:400-441)
* ``remove``     -> None, empty input ignored (bindings.py:443-472)
* ``knn_query``  -> ((n, k) int32 ids, (n, k) float32 dists) padded with
  id=-1 / dist=NaN when fewer than k results exist
  (HNSWIndexExports.cs:144)
* ``range_query``-> ragged per-query lists (bindings.py:523-597)

Where the ctypes layer talks to a NativeAOT shared library, this class
talks to the JAX/TPU engine in `hnswindex_tpu.index.HNSWIndex` — plus it
exposes the capabilities the reference's C ABI never plumbed through
(serialize/deserialize, get_info, connected components, filters, layer
arguments), closing the L3/L4 capability gap noted in SURVEY.md §5.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

from .index import HNSWIndex
from .ops import distance as dst
from .params import HNSWParameters


class Index:
    """Python-bindings-compatible facade (bindings.py:142-171)."""

    def __init__(self, dim: int, metric: str = "sq_euclid"):
        dst.check_metric(metric)
        self.dim = int(dim)
        self.metric = metric
        self._initialized = False
        self._params = HNSWParameters()
        self._impl: HNSWIndex | None = None

    # -- lazy init ------------------------------------------------------

    def _require_uninitialized(self):
        if self._initialized:
            # the native layer rejects setter calls after creation
            # (HNSWIndexExports.cs:224-229 pattern)
            raise RuntimeError(
                "configuration setters must be called before the index is "
                "initialized (before the first add)")

    def _initialize(self):
        self._impl = HNSWIndex(self.dim, self.metric, self._params)
        self._initialized = True

    def _require_initialized(self) -> HNSWIndex:
        # the reference documents these entry points as "assumes the
        # native index has already been initialized" (bindings.py:461,
        # :543) — surface that contract as a clean error instead of an
        # AttributeError on the missing engine
        if self._impl is None:
            raise RuntimeError(
                "index is not initialized; add items first")
        return self._impl

    # -- setters (bindings.py:200-398) ----------------------------------

    def set_collection_size(self, init_size: int):
        self._require_uninitialized()
        if init_size < 1:
            raise RuntimeError("collection_size must be >= 1")
        self._params.collection_size = int(init_size)

    def set_max_edges(self, max_conn: int):
        self._require_uninitialized()
        if max_conn < 1:
            raise RuntimeError("max_edges must be >= 1")
        self._params.max_edges = int(max_conn)

    def set_max_candidates(self, max_candidates: int):
        self._require_uninitialized()
        if max_candidates < 1:
            raise RuntimeError("max_candidates must be >= 1")
        self._params.max_candidates = int(max_candidates)

    def set_remove_max_candidates(self, rem_max_candidates: int):
        self._require_uninitialized()
        if rem_max_candidates < 1:
            raise RuntimeError("remove_max_candidates must be >= 1")
        self._params.remove_max_candidates = int(rem_max_candidates)

    def set_distribution_rate(self, dist_rate: float):
        self._require_uninitialized()
        if dist_rate < 0:
            raise RuntimeError("distribution_rate must be >= 0")
        self._params.distribution_rate = float(dist_rate)

    def set_random_seed(self, random_seed: int):
        self._require_uninitialized()
        self._params.random_seed = int(random_seed)

    def set_min_nn(self, min_nn: int):
        self._require_uninitialized()
        if min_nn < 1:
            raise RuntimeError("min_nn must be >= 1")
        self._params.min_nn = int(min_nn)

    def set_allow_removals(self, allow_removals: bool):
        self._require_uninitialized()
        self._params.allow_removals = bool(allow_removals)

    # -- data ops -------------------------------------------------------

    def add(self, vecs) -> np.ndarray:
        if not self._initialized:
            self._initialize()
        return self._impl.add(vecs)

    def remove(self, ids) -> None:
        arr = np.asarray(ids, dtype=np.int32).ravel()
        if arr.size == 0:
            return           # empty input ignored even pre-init
        self._require_initialized().remove(arr)

    def knn_query(self, queries, k: int, filter_fnc=None, layer: int = 0,
                  exact: bool = False) -> Tuple[np.ndarray, np.ndarray]:
        return self._require_initialized().knn_query(
            queries, k, filter_fnc=filter_fnc, layer=layer, exact=exact)

    def range_query(self, queries, radius: float, filter_fnc=None,
                    layer: int = 0
                    ) -> Tuple[List[np.ndarray], List[np.ndarray]]:
        return self._require_initialized().range_query(
            queries, radius, filter_fnc=filter_fnc, layer=layer)

    def multi_layer_knn_query(self, query, k: int, max_layer: int = 2 ** 30,
                              min_layer: int = 0):
        return self._require_initialized().multi_layer_knn_query(
            query, k, max_layer, min_layer)

    # -- extended API (beyond the reference's C ABI) --------------------

    @property
    def count(self) -> int:
        return 0 if self._impl is None else self._impl.count

    def ids(self) -> np.ndarray:
        if self._impl is None:
            return np.empty(0, np.int32)
        return self._impl.ids()

    def items(self) -> np.ndarray:
        if self._impl is None:
            return np.empty((0, self.dim), np.float32)
        return self._impl.items()

    def get_info(self):
        return self._require_initialized().get_info()

    def get_connected_component_counts(self):
        if self._impl is None:
            return []
        return self._impl.get_connected_component_counts()

    def serialize(self, path: str) -> None:
        self._require_initialized().serialize(path)

    @classmethod
    def deserialize(cls, path: str) -> "Index":
        impl = HNSWIndex.deserialize(path)
        idx = cls(impl.dim, impl.metric)
        idx._impl = impl
        idx._params = impl.params
        idx._initialized = True
        return idx
