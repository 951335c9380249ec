"""hnswindex_tpu — a TPU-native HNSW approximate-nearest-neighbor engine.

Brand-new JAX/XLA/Pallas implementation with the full capability surface of
the reference .NET library (Skaipi/HNSWIndex.Net): see SURVEY.md for the
blueprint and the per-module docstrings for design notes and reference
file:line citations.

Public API:

* :class:`Index` — drop-in equivalent of the reference's Python bindings
  (``from hnswindex import Index``).
* :class:`HNSWIndex` — the full-featured facade mirroring the .NET
  ``HNSWIndex<TVector, TDistance>`` class (filters, layers, multi-layer
  queries, info, components, serialize/deserialize).
* :class:`HNSWParameters` — configuration (same fields/defaults as the
  reference).
"""

from .bindings_api import Index
from .index import HNSWIndex
from .params import HNSWParameters
from .core.stats import HNSWInfo, LayerInfo
from .results import KNNResult
from .block import BlockIndex
from .parallel.block_sharded import ShardedBlockIndex
from .ops.distance import register_metric

__version__ = "0.1.0"

__all__ = ["Index", "HNSWIndex", "HNSWParameters", "HNSWInfo", "LayerInfo",
           "KNNResult", "BlockIndex", "ShardedBlockIndex",
           "register_metric", "__version__"]
