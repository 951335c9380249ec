"""Float64 result refinement shared by every index front end.

Search ranks with f32 (or packed bf16-residual) distances on the MXU; the
returned (id, distance) pairs are recomputed in float64 on the host and
re-sorted, matching the numeric contract of the reference's scalar kernels
(bindings/__tests__/metric_test.py oracle comparisons at 1e-5).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from ..ops import distance as dst


def refine_pairs(metric: str, q: np.ndarray, ids: np.ndarray,
                 cand_vecs: np.ndarray, k: int
                 ) -> Tuple[np.ndarray, np.ndarray]:
    """Re-rank candidate rows in float64.

    ``q (B, D)``, ``ids (B, W)`` int (-1 pad), ``cand_vecs (B, W, D)`` the
    stored vectors of those ids (rows for -1 entries may be garbage).
    Returns (ids (B, k) int32, dists (B, k) f32) ascending with the
    reference C ABI's -1/NaN padding (HNSWIndexExports.cs:144)."""
    B = q.shape[0]
    vecs = cand_vecs.astype(np.float64)
    qq = q.astype(np.float64)[:, None, :]
    if dst.is_custom(metric):
        d = np.asarray(dst.exact(metric, qq.astype(np.float32),
                                 vecs.astype(np.float32)), dtype=np.float64)
    elif metric == "sq_euclid":
        d = np.sum((qq - vecs) ** 2, axis=-1)
    else:
        dot = np.sum(qq * vecs, axis=-1)
        if metric == "cosine":
            qn = np.linalg.norm(qq, axis=-1)
            cn = np.linalg.norm(vecs, axis=-1)
            denom = qn * cn
            d = np.where(denom > 0, 1.0 - dot / np.where(denom > 0,
                                                         denom, 1.0), 1.0)
        else:
            d = 1.0 - dot
    d = np.where(ids >= 0, d, np.inf)
    order = np.argsort(d, axis=1, kind="stable")[:, :k]
    rows = np.arange(B)[:, None]
    out_ids = np.take_along_axis(np.asarray(ids), order, axis=1)
    out_d = d[rows, order].astype(np.float32)
    out_d = np.where(out_ids >= 0, out_d, np.nan)
    return out_ids.astype(np.int32), out_d
