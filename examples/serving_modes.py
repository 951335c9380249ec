"""The serving-mode ladder: graph / exact / block / sharded."""
import numpy as np
from hnswindex_tpu import HNSWIndex, HNSWParameters, BlockIndex

rng = np.random.default_rng(0)
centers = rng.random((200, 128)).astype(np.float32)
vecs = centers[rng.integers(0, 200, 100_000)] \
    + 0.03 * rng.standard_normal((100_000, 128)).astype(np.float32)

# dynamic HNSW index: add/remove/range/filters
idx = HNSWIndex(128, parameters=HNSWParameters(collection_size=100_000))
ids = idx.add(vecs)
print("graph:", idx.knn_query(vecs[:4], 5)[0][0])
print("exact:", idx.knn_query(vecs[:4], 5, exact=True)[0][0])

# block index: large-corpus serving (contiguous MXU block scoring)
bix = BlockIndex(128)
bix.build(vecs)
print("block:", bix.knn_query(vecs[:4], 5, n_probe=16)[0][0])

# multi-chip (run under a mesh / multiple devices):
# from hnswindex_tpu.parallel.sharded import ShardedIndex

# multi-chip bulk block serving (replicated routing, per-shard scoring):
# from hnswindex_tpu import ShardedBlockIndex
# sbx = ShardedBlockIndex(128, devices=jax.devices())
# sbx.build(vecs); sbx.knn_query(vecs[:4], 5, n_probe=16)
