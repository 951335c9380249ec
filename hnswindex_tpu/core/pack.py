"""Packed-neighborhood serving engine: the fast path for graph queries.

Motivation (measured, see CLAUDE.md): XLA row gathers on TPU are
row-count-bound (~tens of millions of rows/s, almost independent of row
width), so the classic HNSW expansion — gather K scattered D-float vectors
per popped node (GraphNavigator.cs:214-251's inner loop) — pays the
row-gather toll K times per expansion and runs far below HBM bandwidth.

The packed layout flips the access pattern so each expansion is ONE wide
contiguous fetch:

* ``res (C, K, D) bf16`` — row u holds the *residual vectors*
  ``r = v - u`` of u's layer-0 neighbors v, contiguously.  Expanding u
  fetches one (K, D) tile instead of K scattered rows.
* residuals instead of absolute vectors because bf16 is precise
  *relatively*: an absolute bf16 vector table carries ~0.4% of the global
  dot magnitude as ranking noise (fatal on clustered corpora where true
  distance gaps are far smaller), while a bf16 residual perturbs each
  neighbor by ~0.4% of its distance *to its parent* — the computed
  ``d = ||q-u||^2 - 2(q-u)·r + ||r||^2`` is the exact distance to that
  microscopically perturbed point.  ``aux (C, K) f32`` stores ``||r||^2``
  (post-rounding, keeping the identity exact); for the cosine family it
  is unused and the rank distance is ``(1 - q·u) - q·r``.
* ``base (C, D) f32`` — the parent vectors (normalized for cosine), so
  ``||q-u||^2`` / ``1 - q·u`` is recomputed exactly per expansion rather
  than chained through the pool (no error accumulation along the walk).
* a compacted **entry set**: all nodes at the lowest upper level whose
  population is <= ``ENTRY_SCAN_MAX``.  One full-precision MXU matmul
  scores every query against the whole set — the TPU-native replacement
  for the sequential upper-layer greedy descent (FindEntryPointQuery,
  GraphNavigator.cs:39-116): the MXU brute-forces exactly what the
  pointer walk approximates, and returns ``n_entry`` seeds for the beam.

The pack is a pure function of the graph state — the index facade builds
it lazily on the first layer-0 query and drops it on any mutation.
Custom (registered) metrics ride the same layout: expansion still fetches
one contiguous (K, D) tile, reconstructs the neighbors (v = u + r) and
evaluates the registered metric elementwise on the VPU; the entry set is
scored by chunked elementwise evaluation instead of one MXU matmul
(_entry_scan_custom).  That keeps custom-metric serving on the packed
traffic profile instead of the row-gather-bound unpacked beam (VERDICT
r4 #10: 2.6k q/s at 1M unpacked).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from ..ops import distance as dst
from .graph import GraphConfig, GraphState
from .search import _dedupe_new, _merge_pool

_INF = jnp.inf

#: Largest compacted entry set the flat MXU scan will take on.  At M=16,
#: level >= 1 holds ~1/16 of the corpus, level >= 2 ~1/256; the smallest
#: upper level whose population fits is used.
ENTRY_SCAN_MAX = 131072

#: Entry-set cap for CUSTOM metrics: the registered-metric entry scan is
#: elementwise on the VPU (no MXU matmul), and at 1M rows the level>=1
#: set (~65k) costs 112 ms of a 120 ms query batch (measured 2026-08-21,
#: benchmarks/custom_metric_probe.py).  Capping the set pushes custom
#: packs one level up the hierarchy (~1/256 of the corpus at M=16) —
#: exact top-n_entry over that level, the classic HNSW entry semantics —
#: and turns the scan into a few ms.
ENTRY_SCAN_MAX_CUSTOM = 8192


def entry_scan_cap(metric: str) -> int:
    return ENTRY_SCAN_MAX_CUSTOM if dst.is_custom(metric) \
        else ENTRY_SCAN_MAX

#: Row chunk for the pack build (bounds the f32 gather intermediate).
_BUILD_CHUNK = 1 << 16


class QueryPack(NamedTuple):
    """Device tables for packed layer-0 serving (see module docstring)."""
    nbr0: jnp.ndarray         # (C, K) i32  layer-0 adjacency
    res: jnp.ndarray          # (C, K, D) bf16 neighbor residuals v - u
    aux: jnp.ndarray          # (C, K) f32  ||r||^2 (sq_euclid) / zeros
    base: jnp.ndarray         # (C, D) f32  parent vectors (normed: cosine)
    entry_ids: jnp.ndarray    # (S,)  i32   high-level node ids, -1 pad
    entry_vecs: jnp.ndarray   # (S, D) f32  their (normed) vectors
    entry_norms: jnp.ndarray  # (S,)  f32


def pack_bytes(capacity: int, k: int, dim: int,
               res_dtype=jnp.bfloat16) -> int:
    """HBM footprint of a pack with the given geometry (``res_dtype``
    residuals + f32 aux/ids + f32 base table)."""
    rb = jnp.dtype(res_dtype).itemsize
    return capacity * k * (dim * rb + 4 + 4) + capacity * dim * 4


@partial(jax.jit, static_argnames=("cfg", "res_dtype"))
def make_query_pack(cfg: GraphConfig, state: GraphState,
                    entry_ids: jnp.ndarray,
                    res_dtype=jnp.bfloat16) -> QueryPack:
    """Build the pack from the live graph state.

    ``entry_ids (S,)`` is the host-compacted high-level node list (-1
    padded).  Residuals are computed in f32 then rounded to ``res_dtype``
    (the index facade auto-selects the widest of float32/bfloat16 whose
    pack fits params.pack_max_bytes), chunked over rows so no full-width
    (C, K, D) f32 intermediate exists."""
    C = state.capacity
    # cap tiles at the 2M degree cap: with layer-0 slack columns
    # (cfg.slack0) the table is wider, but the slack lanes hold only
    # not-yet-repruned recent arrivals — replicating them would grow the
    # pack's HBM footprint ~25% for edges the next overflow prune may
    # discard
    K = min(state.nbr0.shape[1], 2 * cfg.max_edges)
    D = cfg.dim
    nbr0 = state.nbr0[:, :K]
    safe = jnp.clip(nbr0, 0, C - 1)

    base = state.vectors
    if cfg.metric == "cosine":
        n = jnp.linalg.norm(base, axis=1, keepdims=True)
        base = jnp.where(n > 0, base / jnp.where(n > 0, n, 1.0), 0.0)

    chunk = min(_BUILD_CHUNK, C)
    n_chunks = -(-C // chunk)
    res0 = jnp.zeros((C, K, D), res_dtype)
    aux0 = jnp.zeros((C, K), jnp.float32)

    def body(i, carry):
        res, aux = carry
        r0 = i * chunk
        idx = lax.dynamic_slice_in_dim(safe, r0, chunk, axis=0)   # (ch, K)
        uv = lax.dynamic_slice_in_dim(base, r0, chunk, axis=0)    # (ch, D)
        nv = base[idx]                                            # (ch,K,D)
        r = (nv - uv[:, None, :]).astype(res_dtype)
        rf = r.astype(jnp.float32)
        a = jnp.sum(rf * rf, axis=-1)  # ||r||^2 AFTER rounding: the
        # ranking identity stays exact for the perturbed point
        res = lax.dynamic_update_slice_in_dim(res, r, r0, axis=0)
        aux = lax.dynamic_update_slice_in_dim(aux, a, r0, axis=0)
        return res, aux

    res, aux = lax.fori_loop(0, n_chunks, body, (res0, aux0))
    if cfg.metric != "sq_euclid":
        aux = jnp.zeros_like(aux)

    esafe = jnp.clip(entry_ids, 0, C - 1)
    return QueryPack(
        nbr0=nbr0, res=res, aux=aux, base=base,
        entry_ids=entry_ids.astype(jnp.int32),
        entry_vecs=base[esafe],
        entry_norms=dst.norm_data(cfg.metric, base[esafe]))


def _entry_scan(cfg: GraphConfig, pack: QueryPack, q, qn, n_entry: int):
    """Exact top-``n_entry`` of the compacted entry set per query: one MXU
    matmul + top-k.  Returns (dists (B, R), ids (B, R)) ascending."""
    dots = jnp.einsum("bd,sd->bs", q, pack.entry_vecs,
                      precision=dst.DOT_PRECISION,
                      preferred_element_type=jnp.float32)
    d = dst.from_dot(cfg.metric, dots, qn[:, None], pack.entry_norms[None, :])
    d = jnp.where(pack.entry_ids[None, :] >= 0, d, _INF)
    S = d.shape[1]
    R = min(n_entry, S)
    if S > 1024:
        ed, ei = lax.approx_min_k(d, R, recall_target=0.95)
    else:
        ei = jnp.argsort(d, axis=1)[:, :R]
        ed = jnp.take_along_axis(d, ei, axis=1)
    ids = pack.entry_ids[ei]
    return jnp.where(jnp.isfinite(ed), ed, _INF), \
        jnp.where(jnp.isfinite(ed), ids, -1)


def _entry_scan_custom(metric: str, pack: QueryPack, q, n_entry: int):
    """Custom-metric form of _entry_scan: the registered metric has no
    dot decomposition, so the entry set is scored by chunked elementwise
    evaluation (VPU) instead of one MXU matmul.  Chunking bounds the
    (B, chunk, D) broadcast intermediate."""
    S = pack.entry_vecs.shape[0]
    B = q.shape[0]
    chunk = min(S, 2048)
    n_chunks = -(-S // chunk)

    def body(i, acc):
        r0 = i * chunk
        ev = lax.dynamic_slice_in_dim(pack.entry_vecs, r0, chunk, axis=0)
        dd = dst.exact(metric, q[:, None, :], ev[None, :, :])
        return lax.dynamic_update_slice(
            acc, dd.astype(jnp.float32), (0, r0))

    d = lax.fori_loop(0, n_chunks, body, jnp.zeros((B, S), jnp.float32))
    d = jnp.where(pack.entry_ids[None, :] >= 0, d, _INF)
    R = min(n_entry, S)
    ei = jnp.argsort(d, axis=1)[:, :R]
    ed = jnp.take_along_axis(d, ei, axis=1)
    ids = pack.entry_ids[ei]
    return jnp.where(jnp.isfinite(ed), ed, _INF), \
        jnp.where(jnp.isfinite(ed), ids, -1)


class _PackCarry(NamedTuple):
    bd: jnp.ndarray
    bi: jnp.ndarray
    bx: jnp.ndarray
    rd: jnp.ndarray
    ri: jnp.ndarray
    it: jnp.ndarray


@partial(jax.jit, static_argnames=("cfg", "ef", "max_iters", "filtered",
                                   "expand", "n_entry"))
def packed_knn_search(cfg: GraphConfig, pack: QueryPack,
                      q: jnp.ndarray, ef: int, max_iters: int,
                      filtered: bool = False,
                      filter_mask: jnp.ndarray | None = None,
                      expand: int = 4, n_entry: int = 8):
    """Layer-0 k-NN over the packed layout (KnnQuery semantics,
    HNSWIndex.cs:107-123; entry descent replaced by the flat scan).

    Returns (dists (B, ef), ids (B, ef)) ascending, -1/inf padded.
    Distances are rank distances (see module docstring) — callers refine
    returned pairs in full precision, as with every other search path."""
    B = q.shape[0]
    C, K = pack.nbr0.shape
    D = pack.res.shape[2]
    P = min(expand, ef)
    # the entry table may hold fewer columns than requested seeds (tiny
    # upper hierarchies pad to small widths) — _entry_scan returns
    # min(n_entry, table width) columns
    R = min(n_entry, ef, pack.entry_ids.shape[0])
    rows = jnp.arange(B)
    sq = cfg.metric == "sq_euclid"
    custom = dst.is_custom(cfg.metric)

    if cfg.metric == "cosine":
        qmag = jnp.linalg.norm(q, axis=1, keepdims=True)
        qh = jnp.where(qmag > 0, q / jnp.where(qmag > 0, qmag, 1.0), 0.0)
    else:
        qh = q
    qn = dst.norm_data(cfg.metric, qh)

    if custom:
        ed, eid = _entry_scan_custom(cfg.metric, pack, qh, R)
    else:
        ed, eid = _entry_scan(cfg, pack, qh, qn, R)  # (B, R)

    bd = jnp.full((B, ef), _INF, jnp.float32).at[:, :R].set(ed[:, :R])
    bi = jnp.full((B, ef), -1, jnp.int32).at[:, :R].set(eid[:, :R])
    bx = jnp.zeros((B, ef), jnp.int32)

    if filtered:
        allow0 = filter_mask[jnp.clip(eid, 0, C - 1)] & (eid >= 0)
        rd = jnp.full((B, ef), _INF, jnp.float32).at[:, :R].set(
            jnp.where(allow0, ed, _INF)[:, :R])
        ri = jnp.full((B, ef), -1, jnp.int32).at[:, :R].set(
            jnp.where(allow0, eid, -1)[:, :R])
    else:
        rd = jnp.zeros((B, 0), jnp.float32)
        ri = jnp.zeros((B, 0), jnp.int32)

    qh16 = qh.astype(pack.res.dtype)   # query at the residual precision
    init = _PackCarry(bd, bi, bx, rd, ri, jnp.asarray(0, jnp.int32))

    def cond(s):
        return (s.it < max_iters) & jnp.any((s.bx == 0) & (s.bi >= 0))

    def body(s):
        unexp = (s.bx == 0) & (s.bi >= 0)
        poskey = jnp.where(unexp, jnp.arange(ef)[None, :], ef + 1)
        pos = jnp.sort(poskey, axis=1)[:, :P]
        has = pos < ef
        posc = jnp.minimum(pos, ef - 1)
        eidx = s.bi[rows[:, None], posc]                 # (B, P)
        eidc = jnp.clip(eidx, 0, C - 1)
        bx = s.bx.at[rows[:, None], posc].max(has.astype(jnp.int32))

        # ONE contiguous tile fetch per expanded node
        nb = pack.nbr0[eidc]                             # (B, P, K)
        rt = pack.res[eidc]                              # (B, P, K, D)
        at = pack.aux[eidc]                              # (B, P, K)
        uv = pack.base[eidc]                             # (B, P, D)

        if custom:
            # no dot decomposition for a registered metric: reconstruct
            # the neighbor vectors from the residual tiles (v = u + r —
            # the same one-contiguous-fetch traffic profile as the
            # built-in path; the reconstructed point is the residual-
            # rounded neighbor, the standard pack perturbation) and
            # evaluate the metric elementwise on the VPU
            nv = uv[:, :, None, :] + rt.astype(jnp.float32)
            nd = dst.exact(cfg.metric, qh[:, None, None, :],
                           nv).astype(jnp.float32)
        elif sq:
            qres = qh[:, None, :] - uv                   # (B, P, D) f32
            du = jnp.sum(qres * qres, axis=-1)           # exact ||q-u||^2
            dots = jnp.einsum("bpkd,bpd->bpk", rt,
                              qres.astype(rt.dtype),
                              precision=(dst.DOT_PRECISION
                                         if rt.dtype == jnp.float32
                                         else None),
                              preferred_element_type=jnp.float32)
            nd = du[:, :, None] - 2.0 * dots + at
        else:
            du = 1.0 - jnp.einsum("bpd,bd->bp", uv, qh,
                                  precision=dst.DOT_PRECISION,
                                  preferred_element_type=jnp.float32)
            dots = jnp.einsum("bpkd,bd->bpk", rt, qh16,
                              precision=(dst.DOT_PRECISION
                                         if rt.dtype == jnp.float32
                                         else None),
                              preferred_element_type=jnp.float32)
            nd = du[:, :, None] - dots

        nb = nb.reshape(B, P * K)
        nd = nd.reshape(B, P * K)
        nbv = (nb >= 0) & jnp.repeat(has, K, axis=1)
        fresh = _dedupe_new(jnp.where(nbv, nb, -1), nbv, s.bi)
        nd = jnp.where(fresh, nd, _INF)
        nid = jnp.where(fresh, nb, -1)

        md = jnp.concatenate([s.bd, nd], axis=1)
        mi = jnp.concatenate([s.bi, nid], axis=1)
        mx = jnp.concatenate([bx, jnp.zeros_like(nid)], axis=1)
        bd2, bi2, bx2 = _merge_pool(md, mi, mx, ef)

        if filtered:
            allow = filter_mask[jnp.clip(nid, 0, C - 1)] & fresh
            rdm = jnp.concatenate([s.rd, jnp.where(allow, nd, _INF)], axis=1)
            rim = jnp.concatenate([s.ri, jnp.where(allow, nid, -1)], axis=1)
            rd2, ri2, _ = _merge_pool(rdm, rim, jnp.zeros_like(rim),
                                      s.rd.shape[1])
        else:
            rd2, ri2 = s.rd, s.ri

        return _PackCarry(bd2, bi2, bx2, rd2, ri2, s.it + 1)

    out = lax.while_loop(cond, body, init)
    if filtered:
        return out.rd, out.ri
    return out.bd, out.bi
