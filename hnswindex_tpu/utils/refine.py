"""Result refinement shared by every index front end.

Search ranks with f32 (or packed bf16-residual) distances on the MXU; the
returned (id, distance) pairs are recomputed with the *direct* metric
formula and re-sorted, matching the numeric contract of the reference's
scalar kernels (bindings/__tests__/metric_test.py oracle comparisons at
1e-5).  Two implementations:

* ``refine_pairs`` — float64 on the host, against a host mirror of the
  stored vectors.  Used while the corpus is small enough to mirror.
* ``refine_on_device`` — direct-formula float32 on the device (no f64
  MXU path exists), transferring only the final (B, k) pairs.  Direct
  diff-square/dot accumulation at 128-d carries ~1e-6 relative error —
  inside the same oracle tolerance — and avoids mirroring multi-GB
  corpora through slow host links.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
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
    if ids.shape[1] < k:     # fewer candidates than requested k: -1/NaN pad
        pad = k - ids.shape[1]
        ids = np.pad(np.asarray(ids), ((0, 0), (0, pad)), constant_values=-1)
        cand_vecs = np.pad(cand_vecs, ((0, 0), (0, pad), (0, 0)))
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


@partial(jax.jit, static_argnames=("metric", "k"))
def _refine_device(metric: str, vectors, q, ids, k: int):
    C = vectors.shape[0]
    idc = jnp.clip(ids, 0, C - 1)
    vv = vectors[idc]                                   # (B, W, D)
    d = dst.exact(metric, q[:, None, :], vv).astype(jnp.float32)
    d = jnp.where(ids >= 0, d, jnp.inf)
    order = jnp.argsort(d, axis=1, stable=True)[:, :k]
    out_ids = jnp.take_along_axis(ids, order, axis=1)
    out_d = jnp.take_along_axis(d, order, axis=1)
    return out_ids.astype(jnp.int32), out_d


def refine_on_device(metric: str, vectors, q: np.ndarray, ids: np.ndarray,
                     k: int) -> Tuple[np.ndarray, np.ndarray]:
    """Device-side refine: gather + direct-formula distances + re-sort on
    the device, then transfer only the (B, k) results (see module
    docstring).  Same contract as :func:`refine_pairs`."""
    ids = np.asarray(ids)
    if ids.shape[1] < k:     # fewer candidates than requested k: -1/NaN pad
        ids = np.pad(ids, ((0, 0), (0, k - ids.shape[1])),
                     constant_values=-1)
    oi, od = _refine_device(metric, vectors, jnp.asarray(q),
                            jnp.asarray(ids), k)
    out_ids = np.asarray(oi)
    out_d = np.asarray(od)
    return out_ids, np.where(out_ids >= 0, out_d, np.nan)
