"""Drop-in compatibility package: ``from hnswindex import Index``.

Mirrors the reference package root (bindings/__init__.py:1-3), which
re-exports the ctypes ``Index``; here it re-exports the TPU-native engine's
bindings-compatible facade so reference users can switch without code
changes."""

from hnswindex_tpu import (HNSWIndex, HNSWInfo, HNSWParameters, Index,
                           LayerInfo)

__all__ = ["Index", "HNSWIndex", "HNSWParameters", "HNSWInfo", "LayerInfo"]
