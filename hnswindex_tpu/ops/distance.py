"""Distance metrics, TPU-first.

TPU-native replacement for the reference's SIMD metric kernels
(src/HNSWIndex/Metrics/EuclideanMetric.cs:11,105 and
src/HNSWIndex/Metrics/CosineMetric.cs:10,95).  The reference dispatches
AVX+FMA / SSE / scalar at runtime; here every metric is expressed through a
single MXU-friendly primitive — a batched dot product — plus per-vector norm
data that is precomputed once per stored vector and cached in HBM:

* ``sq_euclid``:  ||a-b||^2   = ||a||^2 + ||b||^2 - 2 a.b
* ``cosine``:     1 - a.b / (||a|| ||b||), with the reference's zero-norm
  guard returning exactly 1 (CosineMetric.cs:88-91).
* ``ucosine``:    1 - a.b (pre-normalized vectors, CosineMetric.cs:95).

The decomposition means the hot search loop needs only one einsum (MXU) per
expansion step plus cheap VPU elementwise math, instead of a scalar
per-edge distance call (GraphData.cs:255-277).

``exact`` computes the direct formula (diff-square-sum) and exists for
numeric-oracle tests and final result refinement; it matches the reference's
returned-distance semantics (MetricsTests.cs:7-92 tolerance 1e-6).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

VALID_METRICS = ("sq_euclid", "cosine", "ucosine")

#: User-registered metrics: name -> jax-traceable fn(a, b) -> distance,
#: broadcasting over leading dims (the TPU analog of the reference's
#: "pass any Func<TVector, TVector, TDistance>" constructor argument,
#: HNSWIndex.cs:20 / README "Flexible Distance Metric").  Custom metrics
#: run the general (non-dot-decomposed) path: fully supported by graph
#: search, construction, removal and range queries; the exact/block MXU
#: fast paths require a dot-decomposable metric and raise otherwise.
_CUSTOM_METRICS: dict = {}


def register_metric(name: str, fn) -> None:
    """Register a custom distance ``fn(a, b) -> d`` (jax-traceable,
    broadcasting over leading dims, reducing the last)."""
    if name in VALID_METRICS:
        raise ValueError(f"{name!r} is a built-in metric")
    if not callable(fn):
        raise TypeError("fn must be callable")
    _CUSTOM_METRICS[name] = fn


def is_custom(metric: str) -> bool:
    return metric in _CUSTOM_METRICS

#: MXU precision for distance dot products.  The TPU default (bf16 passes)
#: costs ~2.5e-3 relative error — enough to scramble near-tie neighbor
#: rankings — so distance math runs the full-f32 path.  Revisit per-kernel
#: once refinement-based reranking lands.
DOT_PRECISION = jax.lax.Precision.HIGHEST


def check_metric(metric: str) -> None:
    if metric not in VALID_METRICS and metric not in _CUSTOM_METRICS:
        raise ValueError(
            f"unknown metric {metric!r}; expected one of {VALID_METRICS} "
            f"or a name registered via register_metric()"
        )


def norm_data(metric: str, v: jnp.ndarray) -> jnp.ndarray:
    """Per-vector auxiliary norm cached alongside stored vectors.

    sq_euclid -> squared L2 norm; cosine -> L2 norm; ucosine -> zeros
    (unused).  Shape ``v[..., D] -> v[...]``.
    """
    if metric == "sq_euclid":
        return jnp.sum(v * v, axis=-1)
    if metric == "cosine":
        return jnp.sqrt(jnp.sum(v * v, axis=-1))
    return jnp.zeros(v.shape[:-1], v.dtype)  # ucosine + custom: unused


def from_dot(metric: str, dot, qn, cn):
    """Distance from a dot product plus the two vectors' norm data.

    Broadcasts over any shapes.  Mirrors the metric formulas at
    EuclideanMetric.cs:11 (squared L2), CosineMetric.cs:10 (cosine with the
    zero-norm -> 1 guard at :88-91) and CosineMetric.cs:95 (unit cosine).
    """
    if metric == "sq_euclid":
        return qn + cn - 2.0 * dot
    if metric == "cosine":
        denom = qn * cn
        return jnp.where(denom > 0.0, 1.0 - dot / denom, 1.0)
    return 1.0 - dot


def pairwise(metric: str, q: jnp.ndarray, x: jnp.ndarray,
             qn=None, xn=None) -> jnp.ndarray:
    """All-pairs distances ``(B, D) x (N, D) -> (B, N)`` via one MXU matmul."""
    if metric in _CUSTOM_METRICS:
        return _CUSTOM_METRICS[metric](
            q[:, None, :], x[None, :, :]).astype(jnp.float32)
    dots = jnp.einsum("bd,nd->bn", q, x, precision=DOT_PRECISION,
                      preferred_element_type=jnp.float32)
    if qn is None:
        qn = norm_data(metric, q)
    if xn is None:
        xn = norm_data(metric, x)
    return from_dot(metric, dots, qn[:, None], xn[None, :])


def gathered(metric: str, q: jnp.ndarray, qn: jnp.ndarray,
             cvecs: jnp.ndarray, cn: jnp.ndarray) -> jnp.ndarray:
    """Distances from each query to its own gathered candidates.

    ``q (B, D)``, ``cvecs (B, K, D)`` -> ``(B, K)``.  This is the hot-path
    form used by every beam-search expansion step (replaces the per-edge
    scalar calls in GraphNavigator.cs:163,231).

    When the candidate table is bfloat16 (ranking mode) the MXU's native
    bf16 x bf16 -> f32 path is used; f32 inputs get the full-precision
    pass."""
    if metric in _CUSTOM_METRICS:
        return _CUSTOM_METRICS[metric](q[:, None, :].astype(cvecs.dtype),
                                       cvecs).astype(jnp.float32)
    lo = cvecs.dtype == jnp.bfloat16
    prec = None if lo else DOT_PRECISION
    dots = jnp.einsum("bkd,bd->bk", cvecs, q.astype(cvecs.dtype),
                      precision=prec, preferred_element_type=jnp.float32)
    return from_dot(metric, dots, qn[:, None], cn)


def exact(metric: str, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Direct-formula distance, broadcasting over leading dims.

    Used by oracle tests and final distance refinement; numerically matches
    the reference's scalar kernels (diff-square accumulation for L2,
    dot/norm for cosine)."""
    if metric in _CUSTOM_METRICS:
        return _CUSTOM_METRICS[metric](a, b)
    if metric == "sq_euclid":
        d = a - b
        return jnp.sum(d * d, axis=-1)
    dot = jnp.sum(a * b, axis=-1)
    if metric == "cosine":
        na = jnp.sqrt(jnp.sum(a * a, axis=-1))
        nb = jnp.sqrt(jnp.sum(b * b, axis=-1))
        denom = na * nb
        return jnp.where(denom > 0.0, 1.0 - dot / denom, 1.0)
    return 1.0 - dot
