"""Batched graph traversal: greedy descent + bounded beam search.

TPU-native replacement for ``GraphNavigator`` (src/HNSWIndex/
GraphNavigator.cs:27-325).  The reference's heap-driven sequential loops
become fixed-shape batched state machines:

* ``greedy_descent`` — the upper-layer entry-point walk
  (FindEntryPoint / FindEntryAtLayer, GraphNavigator.cs:27-116).  One
  ``lax.while_loop`` carries (current node, current layer) per query; each
  iteration gathers the K neighbors of every query's current node, computes
  all distances with one MXU einsum, and either hops to the best closer
  neighbor or steps down a layer.
* ``beam_search`` — SearchLayer / SearchLayerQuery
  (GraphNavigator.cs:123-256).  The two binary heaps become one sorted
  (dist, id, expanded) pool of static width ``ef`` per query, merged with
  ``lax.sort`` each step; the versioned VisitedList (VisitedListPool.cs)
  becomes a per-query visited bitmap updated by scatter.  Each iteration
  expands the closest unexpanded pool entry — the exact node the
  reference's frontier heap would pop — and a query terminates when its
  pool has no unexpanded entry (the fixed-shape analog of the early-break
  at GraphNavigator.cs:147-150).
* ``range_search`` — SearchLayerRange (GraphNavigator.cs:262-325): the
  traversal frontier is restricted to nodes within ``radius`` (the
  reference pushes only neighbors with d <= range, :303) and every
  in-range node reached is expanded; results are capped at a static pool
  width, with saturation reported so the host can retry wider.

Filtered queries (HNSWIndex.cs:111-117) carry a separate result pool:
filtered-out nodes still steer traversal (the reference pushes them to the
frontier heap but not to results, GraphNavigator.cs:235-239).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from ..ops import distance as dst
from .graph import GraphConfig, GraphState, nbr_slice, upper_rows

_INF = jnp.inf


def _dist_to_nodes(metric, q, qn, vectors, norms, ids):
    """Distances from each query (B, D) to its own node id column(s).

    ``vectors`` is the *ranking* table (f32 or bf16, GraphState.vlo)."""
    C = vectors.shape[0]
    idc = jnp.clip(ids, 0, C - 1)
    if ids.ndim == 1:
        if dst.is_custom(metric):
            return dst.exact(metric, q.astype(vectors.dtype),
                             vectors[idc]).astype(jnp.float32)
        lo = vectors.dtype == jnp.bfloat16
        dots = jnp.einsum("bd,bd->b", q.astype(vectors.dtype),
                          vectors[idc],
                          precision=None if lo else dst.DOT_PRECISION,
                          preferred_element_type=jnp.float32)
        return dst.from_dot(metric, dots, qn, norms[idc])
    return dst.gathered(metric, q, qn, vectors[idc], norms[idc])


# ---------------------------------------------------------------------------
# Greedy upper-layer descent
# ---------------------------------------------------------------------------

class _GreedyCarry(NamedTuple):
    cur: jnp.ndarray    # (B,) current node id
    curd: jnp.ndarray   # (B,) its distance
    lay: jnp.ndarray    # (B,) current layer
    it: jnp.ndarray


def greedy_descent(cfg: GraphConfig, state: GraphState,
                   q: jnp.ndarray, qn: jnp.ndarray,
                   start: jnp.ndarray, start_layer: jnp.ndarray,
                   stop_layer: jnp.ndarray,
                   max_iters: int = 4096):
    """Walk layers (start_layer .. stop_layer+1], greedily moving to closer
    neighbors within each layer before stepping down.

    ``start``/``start_layer``/``stop_layer`` are (B,) per-query (items in a
    construction wave descend to different layers).  Returns the (B,) entry
    node for layer ``stop_layer`` and its distance.  Matches
    FindEntryPoint's loop structure (GraphNavigator.cs:27-45): layers
    <= stop_layer are not walked.
    """
    B = q.shape[0]
    C = state.capacity
    L = state.num_levels
    rows = jnp.arange(B)

    curd = _dist_to_nodes(cfg.metric, q, qn, state.vlo, state.norms,
                          start)
    init = _GreedyCarry(cur=start.astype(jnp.int32), curd=curd,
                        lay=start_layer.astype(jnp.int32),
                        it=jnp.asarray(0, jnp.int32))

    def active_of(c):
        return (c.lay > stop_layer) & (c.cur >= 0)

    def cond(c):
        return (c.it < max_iters) & jnp.any(active_of(c))

    # NOTE: this 3-D [layer, node] gather gets a compact operand layout at
    # batch width >= 8; at width 1 XLA materializes a lane-padded copy of
    # the whole table (4x HBM — OOM at 8M rows), which is why every host
    # bucket ladder starts at 8 (index.WAVE_BUCKETS et al.).
    # The descent only ever walks layers > stop_layer >= 0, so it reads
    # the upper tables exclusively (inactive lanes gather garbage rows
    # that the act mask discards).
    def body(c):
        act = active_of(c)
        curc = jnp.clip(c.cur, 0, C - 1)
        nb = upper_rows(state, c.lay, curc)              # (B, Ku)
        nbv = (nb >= 0) & act[:, None]
        nd = _dist_to_nodes(cfg.metric, q, qn, state.vlo, state.norms,
                            jnp.where(nbv, nb, 0))
        nd = jnp.where(nbv, nd, _INF)
        best = jnp.argmin(nd, axis=1)
        bd = nd[rows, best]
        improved = (bd < c.curd) & act
        cur = jnp.where(improved, nb[rows, best], c.cur)
        curd = jnp.where(improved, bd, c.curd)
        # no improvement at this layer -> descend one layer, same node
        lay = jnp.where(act & ~improved, c.lay - 1, c.lay)
        return _GreedyCarry(cur, curd, lay, c.it + 1)

    out = lax.while_loop(cond, body, init)
    return out.cur, out.curd


# ---------------------------------------------------------------------------
# Beam search (SearchLayer / SearchLayerQuery)
# ---------------------------------------------------------------------------

class _BeamCarry(NamedTuple):
    bd: jnp.ndarray       # (B, ef) pool distances, ascending
    bi: jnp.ndarray       # (B, ef) pool ids, -1 pad
    bx: jnp.ndarray       # (B, ef) expanded flags (i32 0/1)
    rd: jnp.ndarray       # (B, rf) result pool (filtered mode) or (B, 0)
    ri: jnp.ndarray
    it: jnp.ndarray


def _merge_pool(keys, ids, flags, width):
    """Keep the ``width`` closest (dist, id, flag) triples, ascending.

    argsort-the-key + payload take_along_axis: 20-30x faster on TPU than
    multi-operand ``lax.sort`` (which was the original hot spot)."""
    order = jnp.argsort(keys, axis=1, stable=True)[:, :width]
    return (jnp.take_along_axis(keys, order, axis=1),
            jnp.take_along_axis(ids, order, axis=1),
            jnp.take_along_axis(flags, order, axis=1))


def _dedupe_new(nid, fresh, pool_ids):
    """Drop candidates already present in the pool or duplicated within the
    expansion batch (first occurrence wins).

    This replaces the reference's VisitedList (VisitedListPool.cs) without
    any per-query visited storage: a node displaced from the top-ef pool
    can only be re-proposed with a distance worse than the pool's worst, so
    the merge drops it again — no duplicate results, no re-expansions
    (re-scans only cost a recomputed distance).

    Pool membership is an O(PK * ef) compare; within-batch duplicates use
    an O(PK^2) compare matrix for narrow expansions and an argsort-based
    adjacent-equal pass for wide ones (the matrix is quadratic in the
    expansion width)."""
    B, PK = nid.shape
    in_pool = jnp.any(nid[:, :, None] == pool_ids[:, None, :], axis=2)
    if PK <= 128:
        eq = nid[:, :, None] == nid[:, None, :]
        earlier = (jnp.arange(PK)[None, :, None]
                   > jnp.arange(PK)[None, None, :])
        dup_self = jnp.any(eq & earlier, axis=2)
    else:
        order = jnp.argsort(nid, axis=1, stable=True)
        snid = jnp.take_along_axis(nid, order, axis=1)
        sdup = jnp.concatenate(
            [jnp.zeros((B, 1), bool), snid[:, 1:] == snid[:, :-1]], axis=1)
        dup_self = jnp.zeros_like(sdup).at[
            jnp.arange(B)[:, None], order].set(sdup)
    return fresh & ~in_pool & ~dup_self


@partial(jax.jit, static_argnames=("cfg", "layer", "ef", "max_iters",
                                   "filtered", "expand"))
def beam_search(cfg: GraphConfig, state: GraphState,
                q: jnp.ndarray, qn: jnp.ndarray,
                ep: jnp.ndarray, ep_ok: jnp.ndarray,
                layer: int, ef: int, max_iters: int,
                filtered: bool = False,
                filter_mask: jnp.ndarray | None = None,
                expand: int = 1):
    """Best-first beam search at one layer for a batch of queries.

    Args:
      q (B, D), qn (B,): queries and their norm data.
      ep (B,): per-query entry node (from greedy_descent); ep_ok masks
        queries with a valid entry (inactive queries return empty pools).
      layer: static layer index (a static slice of the neighbor table
        aliases the parameter; a traced index would copy the whole
        (C, K) layer slice per call).
      ef: static pool width (= max(MinNN, k) for queries, HNSWIndex.cs:115;
        = MaxCandidates during construction, GraphConnector.cs:189).
      filtered/filter_mask: optional (C,) bool of allowed result ids.
      expand: nodes expanded per iteration.  expand=1 reproduces the
        reference's one-pop-per-step frontier semantics
        (GraphNavigator.cs:146); expand>1 amortizes the sequential
        while_loop latency over wider gathers/matmuls — the key TPU
        throughput lever (the extra nodes expanded are exactly the next
        ones a serial run would usually pop, so recall is preserved).

    Returns (dists (B, ef), ids (B, ef)) ascending, -1/inf padded — the
    reference's topCandidates heap contents (GraphNavigator.cs:188).
    """
    B = q.shape[0]
    C = state.capacity
    P = min(expand, ef)
    rows = jnp.arange(B)
    nbr_l, _ = nbr_slice(state, layer)                       # (C, K_l)
    K = nbr_l.shape[1]

    epc = jnp.clip(ep, 0, C - 1)
    d0 = _dist_to_nodes(cfg.metric, q, qn, state.vlo, state.norms, epc)
    d0 = jnp.where(ep_ok, d0, _INF)
    ep_eff = jnp.where(ep_ok, ep, -1)

    bd = jnp.full((B, ef), _INF, jnp.float32).at[:, 0].set(d0)
    bi = jnp.full((B, ef), -1, jnp.int32).at[:, 0].set(ep_eff)
    bx = jnp.zeros((B, ef), jnp.int32)

    if filtered:
        rf = ef
        allow0 = filter_mask[epc] & ep_ok
        rd = jnp.full((B, rf), _INF, jnp.float32).at[:, 0].set(
            jnp.where(allow0, d0, _INF))
        ri = jnp.full((B, rf), -1, jnp.int32).at[:, 0].set(
            jnp.where(allow0, ep, -1))
    else:
        rd = jnp.zeros((B, 0), jnp.float32)
        ri = jnp.zeros((B, 0), jnp.int32)

    init = _BeamCarry(bd, bi, bx, rd, ri, jnp.asarray(0, jnp.int32))

    def cond(s):
        return (s.it < max_iters) & jnp.any((s.bx == 0) & (s.bi >= 0))

    def body(s):
        unexp = (s.bx == 0) & (s.bi >= 0)
        # positions of the first (closest) P unexpanded pool entries
        poskey = jnp.where(unexp, jnp.arange(ef)[None, :], ef + 1)
        pos = jnp.sort(poskey, axis=1)[:, :P]            # (B, P)
        has = pos < ef                                   # (B, P)
        posc = jnp.minimum(pos, ef - 1)
        eid = s.bi[rows[:, None], posc]                  # (B, P)
        eidc = jnp.clip(eid, 0, C - 1)
        bx = s.bx.at[rows[:, None], posc].max(has.astype(jnp.int32))

        nb = nbr_l[eidc].reshape(B, P * K)               # (B, P*K)
        nbv = (nb >= 0) & jnp.repeat(has, K, axis=1)
        fresh = _dedupe_new(jnp.where(nbv, nb, -1), nbv, s.bi)

        nd = _dist_to_nodes(cfg.metric, q, qn, state.vlo, state.norms,
                            jnp.where(fresh, nb, 0))
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
            rd2, ri2, _ = _merge_pool(rdm, rim,
                                      jnp.zeros_like(rim), s.rd.shape[1])
        else:
            rd2, ri2 = s.rd, s.ri

        return _BeamCarry(bd2, bi2, bx2, rd2, ri2, s.it + 1)

    out = lax.while_loop(cond, body, init)
    if filtered:
        return out.rd, out.ri
    return out.bd, out.bi


# ---------------------------------------------------------------------------
# Range search (SearchLayerRange)
# ---------------------------------------------------------------------------

class _RangeCarry(NamedTuple):
    bd: jnp.ndarray
    bi: jnp.ndarray
    bx: jnp.ndarray
    it: jnp.ndarray


@partial(jax.jit, static_argnames=("cfg", "layer", "pool", "max_iters",
                                   "filtered"))
def range_search(cfg: GraphConfig, state: GraphState,
                 q: jnp.ndarray, qn: jnp.ndarray,
                 ep: jnp.ndarray, ep_ok: jnp.ndarray,
                 layer: int, radius, pool: int, max_iters: int,
                 filtered: bool = False,
                 filter_mask: jnp.ndarray | None = None):
    """All nodes within ``radius``, BFS over the in-range subgraph.

    Mirrors SearchLayerRange (GraphNavigator.cs:262-325): only neighbors
    with d <= radius join the frontier (:303), and every in-range node is
    expanded.  Entry nodes are expanded even when out of range (the
    reference pushes its entry unconditionally, :277).

    ``ep``/``ep_ok`` may be (B,) — the reference's single greedy entry —
    or (B, E) multi-seed (callers pass a preliminary k-NN beam's pool,
    which covers in-range pockets that are not connected to the entry
    through other in-range nodes; strictly a recall superset of the
    reference's single-entry BFS with identical within-radius semantics).

    Returns (dists, ids, saturated (B,) bool); ``saturated`` flags queries
    whose static result pool overflowed — the host retries with a larger
    pool (the reference's heaps grow dynamically instead).
    """
    B = q.shape[0]
    C = state.capacity
    rows = jnp.arange(B)
    nbr_l, _ = nbr_slice(state, layer)

    if ep.ndim == 1:
        ep = ep[:, None]
        ep_ok = ep_ok[:, None]
    E = min(ep.shape[1], pool)
    ep = ep[:, :E]
    ep_ok = ep_ok[:, :E] & (ep >= 0)
    epc = jnp.clip(ep, 0, C - 1)
    d0 = dst.gathered(cfg.metric, q, qn, state.vlo[epc], state.norms[epc])
    d0 = jnp.where(ep_ok, d0, _INF)

    # pool entries: in-range nodes (plus the entry nodes, which may be out
    # of range but must be expanded once; they are masked out of final
    # results if out of range).
    bd = jnp.full((B, pool), _INF, jnp.float32).at[:, :E].set(d0)
    bi = jnp.full((B, pool), -1, jnp.int32).at[:, :E].set(
        jnp.where(ep_ok, ep, -1))
    bx = jnp.zeros((B, pool), jnp.int32)
    init = _RangeCarry(bd, bi, bx, jnp.asarray(0, jnp.int32))

    def cond(s):
        return (s.it < max_iters) & jnp.any((s.bx == 0) & (s.bi >= 0))

    def body(s):
        unexp = (s.bx == 0) & (s.bi >= 0)
        has = jnp.any(unexp, axis=1)
        pos = jnp.argmax(unexp, axis=1)
        eid = s.bi[rows, pos]
        eidc = jnp.clip(eid, 0, C - 1)
        bx = s.bx.at[rows, pos].set(1)

        nb = nbr_l[eidc]
        nbv = (nb >= 0) & has[:, None]
        fresh = _dedupe_new(jnp.where(nbv, nb, -1), nbv, s.bi)

        nd = _dist_to_nodes(cfg.metric, q, qn, state.vlo, state.norms,
                            jnp.where(fresh, nb, 0))
        keep = fresh & (nd <= radius)          # GraphNavigator.cs:303
        nd = jnp.where(keep, nd, _INF)
        nid = jnp.where(keep, nb, -1)

        md = jnp.concatenate([s.bd, nd], axis=1)
        mi = jnp.concatenate([s.bi, nid], axis=1)
        mx = jnp.concatenate([bx, jnp.zeros_like(nid)], axis=1)
        bd2, bi2, bx2 = _merge_pool(md, mi, mx, pool)
        return _RangeCarry(bd2, bi2, bx2, s.it + 1)

    out = lax.while_loop(cond, body, init)
    ok = (out.bi >= 0) & (out.bd <= radius)
    # saturation must see the pre-filter pool occupancy (filtered-out rows
    # still hold slots) and reserve the E seed slots: an out-of-range seed
    # evicted before expansion would silently lose its in-range pocket, so
    # any pool that *could* have evicted one triggers the host retry.
    n_occ = jnp.sum(ok, axis=1)
    saturated = n_occ + E >= pool
    if filtered:
        ok = ok & filter_mask[jnp.clip(out.bi, 0, C - 1)]
    return (jnp.where(ok, out.bd, _INF), jnp.where(ok, out.bi, -1),
            saturated)


# ---------------------------------------------------------------------------
# Full query pipelines (FindEntryPointQuery + SearchLayerQuery)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("cfg", "layer", "ef", "max_iters",
                                   "filtered", "expand"))
def knn_search(cfg: GraphConfig, state: GraphState, q: jnp.ndarray,
               layer: int, ef: int, max_iters: int,
               filtered: bool = False,
               filter_mask: jnp.ndarray | None = None,
               expand: int = 1):
    """KnnQuery hot path (HNSWIndex.cs:107-123): greedy-descend from the
    global entry point to ``layer``, then beam-search with width ``ef``.

    Returns (dists (B, ef), ids (B, ef)) ascending."""
    B = q.shape[0]
    qn = dst.norm_data(cfg.metric, q)
    ep = jnp.broadcast_to(state.ep, (B,))
    ep_ok = ep >= 0
    ep_layer = jnp.where(ep_ok, state.level[jnp.clip(ep, 0, None)], -1)
    stop = jnp.broadcast_to(jnp.asarray(layer, jnp.int32), (B,))
    entry, _ = greedy_descent(cfg, state, q, qn, ep, ep_layer, stop)
    return beam_search(cfg, state, q, qn, entry, ep_ok, layer, ef,
                       max_iters, filtered, filter_mask, expand)
