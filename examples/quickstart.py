"""Quickstart: the reference bindings' README flow, plus the TPU extras."""
import numpy as np
from hnswindex import Index                      # drop-in package name

vectors = np.random.rand(2_000, 128).astype(np.float32)

index = Index(dim=128, metric="sq_euclid")
index.set_collection_size(2_000)
ids = index.add(vectors)                         # wave-batched build
nn_ids, dists = index.knn_query(vectors, k=1)
print("self-recall@1:", (nn_ids[:, 0] == ids).mean())

# extras the reference never exposed through its bindings:
index.serialize("/tmp/quickstart.npz")
restored = Index.deserialize("/tmp/quickstart.npz")
print("restored count:", restored.count)
exact_ids, _ = index.knn_query(vectors[:5], 10, exact=True)   # recall 1.0
print("components per layer:", index.get_connected_component_counts())
