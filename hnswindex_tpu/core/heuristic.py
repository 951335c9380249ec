"""Batched relative-neighbor pruning.

Vectorized TPU equivalent of ``Heuristic<TDistance>.RelativeNeighborPruning``
(src/HNSWIndex/Heuristic.cs:11-46) — hnswlib's getNeighborsByHeuristic2
analog.  Reference semantics, preserved exactly per item:

* fewer candidates than ``max_edges`` -> keep all, no pruning
  (Heuristic.cs:13-18);
* otherwise sort candidates by distance to the target ascending and accept
  candidate c iff no already-accepted s satisfies d(s, c) < d(c, target),
  stopping at ``max_edges`` accepts (Heuristic.cs:22-41).

The O(cand^2) inner distance test becomes one batched pairwise-distance
matrix on the MXU plus a ``lax.scan`` over the sorted candidate axis —
each scan step is a cheap (B, N) vector op on the VPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from ..ops import distance as dst

_INF = jnp.inf


def prune(metric: str,
          cand_ids: jnp.ndarray,     # (B, N) i32, -1 = invalid
          cand_d: jnp.ndarray,       # (B, N) f32 distance to target
          cand_vecs: jnp.ndarray,    # (B, N, D) gathered candidate vectors
          cand_norms: jnp.ndarray,   # (B, N) gathered norm data
          max_edges: int,
          force_mask: jnp.ndarray | None = None,
          ):
    """Select up to ``max_edges`` diverse neighbors per row.

    Returns ``(sel_ids (B, max_edges) i32 padded -1, sel_count (B,) i32)``;
    selected ids appear in ascending-distance order.

    ``force_mask`` (B,) optionally disables work for masked-out rows
    (their outputs are all -1 / 0).
    """
    B, N = cand_ids.shape
    valid = cand_ids >= 0
    if force_mask is not None:
        valid = valid & force_mask[:, None]

    d = jnp.where(valid, cand_d, _INF)
    order = jnp.argsort(d, axis=1, stable=True)
    rows = jnp.arange(B)[:, None]
    sid = jnp.take_along_axis(cand_ids, order, axis=1)
    sd = jnp.take_along_axis(d, order, axis=1)
    svalid = jnp.take_along_axis(valid, order, axis=1)
    svecs = jnp.take_along_axis(cand_vecs, order[:, :, None], axis=1)
    snorms = jnp.take_along_axis(cand_norms, order, axis=1)

    # Pairwise candidate-candidate distances (B, N, N) — one MXU batch op
    # replacing the reference's per-pair distanceFnc calls (Heuristic.cs:34).
    if dst.is_custom(metric):
        # general path: one candidate column at a time keeps the (B, N, D)
        # broadcast bounded
        fn = dst._CUSTOM_METRICS[metric]
        pd = lax.map(lambda i: fn(svecs[:, i, None, :], svecs),
                     jnp.arange(N)).transpose(1, 0, 2)  # (B, i, j)
    else:
        lo = svecs.dtype == jnp.bfloat16
        dots = jnp.einsum("bid,bjd->bij", svecs, svecs,
                          precision=None if lo else dst.DOT_PRECISION,
                          preferred_element_type=jnp.float32)
        pd = dst.from_dot(metric, dots, snorms[:, :, None],
                          snorms[:, None, :])

    n_valid = jnp.sum(svalid, axis=1)
    keep_all = n_valid < max_edges  # Heuristic.cs:13-18

    # The sequential accept loop (Heuristic.cs:23-41) is computed exactly by
    # wavefront fixed-point: candidate c conflicts with earlier candidate s
    # iff d(s, c) < d(c, target); each round decides every candidate whose
    # earlier conflicts are all decided (reject if an accepted conflict
    # exists, accept if none can).  The first undecided candidate is always
    # decidable, so rounds <= conflict-chain depth — single-digit in
    # practice vs N sequential steps.  The accept-count cap is applied
    # afterwards by truncation, which matches the sequential break exactly
    # (acceptance of c only depends on accepts before c).
    tri = (jnp.arange(N)[:, None] < jnp.arange(N)[None, :])  # s earlier than c
    conflict = tri[None, :, :] & (pd < sd[:, None, :]) \
        & svalid[:, :, None] & svalid[:, None, :]            # (B, s, c)

    def cond(carry):
        acc, rej, it = carry
        und = svalid & ~acc & ~rej
        return jnp.any(und) & (it < N)

    def round_(carry):
        acc, rej, it = carry
        und = svalid & ~acc & ~rej
        hit_acc = jnp.any(conflict & acc[:, :, None], axis=1)
        blocked = jnp.any(conflict & (acc | und)[:, :, None], axis=1)
        rej_new = und & hit_acc
        acc_new = und & ~blocked
        return acc | acc_new, rej | rej_new, it + 1

    acc0 = jnp.zeros((B, N), bool)
    accepted, _, _ = lax.while_loop(
        cond, round_, (acc0, jnp.zeros((B, N), bool),
                       jnp.asarray(0, jnp.int32)))
    accepted = jnp.where(keep_all[:, None], svalid, accepted)
    # cap at max_edges accepts (in ascending-distance order)
    accepted = accepted & (jnp.cumsum(accepted, axis=1) <= max_edges)
    count = jnp.sum(accepted, axis=1, dtype=jnp.int32)

    # Compact accepted ids (already in ascending-distance order) into the
    # first ``count`` output slots.
    pos = jnp.cumsum(accepted, axis=1) - 1
    pos = jnp.where(accepted, pos, max_edges)  # dropped -> OOB column
    out = jnp.full((B, max_edges + 1), -1, jnp.int32)
    out = out.at[rows, pos].set(jnp.where(accepted, sid, -1), mode="drop")
    return out[:, :max_edges], count
