"""Rich result records.

Mirror of the reference's public result type ``KNNResult<TVector,
TDistance>`` (src/HNSWIndex/KNNResult.cs:3-16: Id, Label — the stored
vector — and Distance).  The array-based query APIs are the primary
surface (TPU-batch-friendly); ``HNSWIndex.knn_query_results`` wraps them
into these records for reference-shaped consumption."""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass
class KNNResult:
    id: int
    label: np.ndarray   # the stored vector (KNNResult.cs "Label")
    distance: float
