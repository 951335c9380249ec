"""Wave-batched removal with graph repair.

TPU-native replacement for the reference's deletion path
(src/HNSWIndex/GraphConnector.cs:53-167 + GraphLocker.cs).  The reference
removes one node at a time under a neighborhood region lock; the TPU build
removes a *wave* of nodes functionally:

1. mark the wave inactive and fix the entry point: if the entry point is
   removed, promote its most-connected surviving neighbor at its top layer
   (TryReplaceEntryPoint, GraphData.cs:146-166); if it has none, fall back
   to the highest-level active node (ForceReplaceEntryPoint,
   GraphData.cs:172-189);
2. per layer, top to bottom (GraphConnector.cs:59):
   a. collect ``remove_max_candidates`` repair candidates around every
      removed node that lives on the layer, with removed nodes excluded
      (GraphConnector.cs:96 + the IsRemoved link guard at :152-155).
      Below the exact-build threshold this is one masked MXU brute-force
      scan per layer — the exact version of the reference's beam — and a
      graph beam search beyond it;
   b. find every *affected* node — an active node with an out-edge into
      the wave.  The reference walks maintained in-edge lists
      (Node.InEdges); the TPU build keeps no in-edge storage and instead
      recovers in-neighbors exactly with one vectorized membership scan
      over the layer's out-edge table;
   c. for each affected node: candidate set = (surviving old neighbors) ∪
      (repair candidates of *each* of its removed neighbors — the
      reference unions across every removed in-edge it repairs,
      GraphConnector.cs:100-131), deduplicated, re-pruned with the
      heuristic to the layer cap (GraphConnector.cs:131) and written back;
   d. clear the removed nodes' own rows at this layer.

Affected nodes are processed in fixed-size chunks driven by the host (their
count is data-dependent); every kernel below is shape-stable so one
compilation serves a whole workload.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from .construct import _prune_rows
from .graph import GraphConfig, GraphState
from .search import beam_search

_INF = jnp.inf

#: Per affected node, union repair candidates of up to this many of its
#: removed neighbors (covers the reference's per-in-edge union for all but
#: pathological rows where most of a node's edges died in one wave).
REPAIR_FANIN = 4

#: Columns of each removed node's candidate list entering the union (the
#: nearest ones; bounds the heuristic-prune width at K + FANIN * SPAN).
REPAIR_SPAN = 48


def _removed_mask(state: GraphState, rem_ids):
    C = state.capacity
    return jnp.zeros((C + 1,), bool).at[
        jnp.where(rem_ids >= 0, rem_ids, C)].set(True)[:C]


@partial(jax.jit, static_argnames=("cfg",), donate_argnames=("state",))
def mark_removed(cfg: GraphConfig, state: GraphState, rem_ids):
    """Deactivate a removal wave and fix the entry point / count.

    Mirrors the IsRemoved flagging (GraphConnector.cs:55-57) plus entry
    point replacement: the removed EP's most-connected surviving neighbor
    at its top layer takes over (GraphData.cs:146-166); with no surviving
    neighbor there, the highest-level active node does
    (GraphData.cs:172-189); an empty graph gets ep = -1."""
    C = state.capacity
    L = state.num_levels
    rmask = _removed_mask(state, rem_ids)
    n_rem = jnp.sum(rmask & state.active, dtype=jnp.int32)
    active = state.active & ~rmask
    count = state.count - n_rem

    ep = state.ep
    epc = jnp.clip(ep, 0, C - 1)
    ep_removed = (ep >= 0) & rmask[epc]

    # TryReplaceEntryPoint: most out-connected surviving neighbor at the
    # EP's top layer
    ep_lvl = jnp.clip(state.level[epc], 0, L - 1)
    row = state.nbr[ep_lvl, epc]                      # (K,)
    rowc = jnp.clip(row, 0, C - 1)
    surv = (row >= 0) & active[rowc]
    score = jnp.where(surv, state.deg[ep_lvl, rowc], -1)
    nb_best = row[jnp.argmax(score)]
    has_nb = jnp.any(surv)

    # ForceReplaceEntryPoint: highest-level active node
    lv_eff = jnp.where(active, state.level, -1)
    scan_best = jnp.argmax(lv_eff).astype(jnp.int32)

    new_ep = jnp.where(has_nb, nb_best, scan_best).astype(jnp.int32)
    new_ep = jnp.where(count > 0, new_ep, -1)
    ep = jnp.where(ep_removed, new_ep, ep)
    return state._replace(active=active, ep=ep, count=count)


@partial(jax.jit, static_argnames=("cfg", "remove_ef", "max_iters"))
def repair_candidates(cfg: GraphConfig, state: GraphState, rem_ids, layer,
                      remove_ef: int, max_iters: int):
    """Beam search around each removed node at ``layer``
    (GraphConnector.cs:96), starting from the removed node itself, with
    removed nodes excluded from results.  Returns (R, remove_ef) ids."""
    C = state.capacity
    rmask = _removed_mask(state, rem_ids)
    q = state.vectors[jnp.clip(rem_ids, 0, C - 1)]
    qn = state.norms[jnp.clip(rem_ids, 0, C - 1)]
    on_layer = (rem_ids >= 0) & (
        state.level[jnp.clip(rem_ids, 0, C - 1)] >= layer)
    _, ids = beam_search(cfg, state, q, qn, rem_ids, on_layer, layer,
                         remove_ef, max_iters, filtered=True,
                         filter_mask=~rmask)
    return ids


@partial(jax.jit, static_argnames=("cfg", "remove_ef"))
def exact_repair_candidates(cfg: GraphConfig, state: GraphState, rem_ids,
                            layer, remove_ef: int):
    """Exact repair candidates: one masked MXU scan of the layer's
    population per removed node (the exact form of the reference's beam at
    GraphConnector.cs:96; the wave is already inactive so removed nodes
    exclude themselves).  Returns (R, remove_ef) ids."""
    from ..ops.bruteforce import exact_knn

    C = state.capacity
    q = state.vectors[jnp.clip(rem_ids, 0, C - 1)]
    allowed = state.active & (state.level >= layer)
    _, ids = exact_knn(cfg.metric, state.vlo, state.norms, allowed, q,
                       remove_ef)
    return jnp.where(rem_ids[:, None] >= 0, ids, -1)


@partial(jax.jit, static_argnames=("cfg",))
def affected_masks_all(cfg: GraphConfig, state: GraphState, rem_ids):
    """(L, C) affected masks for every layer in one pass.

    Edges into removed nodes are never *added* during repair, so the
    per-layer in-neighbor sets depend only on the pre-repair state — one
    table scan + one host readback serves the whole wave (each readback
    costs ~35 ms through remote runtimes)."""
    C = state.capacity
    rmask = _removed_mask(state, rem_ids)
    hit = (state.nbr >= 0) & rmask[jnp.clip(state.nbr, 0, C - 1)]
    return jnp.any(hit, axis=2) & state.active[None, :]


@partial(jax.jit, static_argnames=("cfg",), donate_argnames=("state",))
def clear_removed_rows_all(cfg: GraphConfig, state: GraphState, rem_ids):
    """Erase removed nodes' out-edges at every layer (single scatter)."""
    C = state.capacity
    K = state.nbr.shape[2]
    L = state.num_levels
    rowd = jnp.where(rem_ids >= 0, rem_ids, C)
    nbr = state.nbr.at[:, rowd, :].set(
        jnp.full((L, rem_ids.shape[0], K), -1, jnp.int32), mode="drop")
    deg = state.deg.at[:, rowd].set(0, mode="drop")
    return state._replace(nbr=nbr, deg=deg)


@partial(jax.jit, static_argnames=("cfg", "max_deg"),
         donate_argnames=("state",))
def repair_chunk(cfg: GraphConfig, state: GraphState, chunk_ids, rem_ids,
                 scand, layer, max_deg: int):
    """Re-select edges for a chunk of affected nodes at ``layer``.

    ``chunk_ids (B,)`` affected nodes (-1 pad); ``rem_ids (R,)`` the removal
    wave; ``scand (R, E)`` their repair candidates.  Candidate set per node
    = surviving old neighbors ∪ repair candidates of each of its removed
    neighbors (up to REPAIR_FANIN of them, REPAIR_SPAN candidates each),
    deduplicated and excluding itself / removed nodes
    (GraphConnector.cs:100-131)."""
    B = chunk_ids.shape[0]
    C = state.capacity
    K = state.nbr.shape[2]
    layer = jnp.asarray(layer, jnp.int32)
    rmask = _removed_mask(state, rem_ids)
    # position of each removed id in the wave, for scand lookup
    R = rem_ids.shape[0]
    rpos = jnp.zeros((C + 1,), jnp.int32).at[
        jnp.where(rem_ids >= 0, rem_ids, C)].set(
            jnp.arange(R, dtype=jnp.int32))

    ok = chunk_ids >= 0
    uc = jnp.clip(chunk_ids, 0, C - 1)
    nbr_l = lax.dynamic_index_in_dim(state.nbr, layer, 0, keepdims=False)
    old = nbr_l[uc]                                     # (B, K)
    old_valid = (old >= 0) & ok[:, None]
    oldc = jnp.clip(old, 0, C - 1)
    old_removed = old_valid & rmask[oldc]
    surviving = old_valid & ~old_removed

    # up to REPAIR_FANIN removed neighbors per row, their candidate spans
    T = min(REPAIR_FANIN, K)
    E = min(REPAIR_SPAN, scand.shape[1])
    slot_rank = jnp.argsort(~old_removed, axis=1, stable=True)[:, :T]
    vids = jnp.take_along_axis(old, slot_rank, axis=1)           # (B, T)
    v_ok = jnp.take_along_axis(old_removed, slot_rank, axis=1)
    srow = scand[rpos[jnp.clip(vids, 0, C)]][:, :, :E]           # (B, T, E)
    srow = jnp.where(v_ok[:, :, None], srow, -1).reshape(B, T * E)

    # dedupe: against surviving old neighbors, self, removed, and within
    # the union (first occurrence wins)
    sr_valid = (srow >= 0) & ok[:, None]
    dup_old = jnp.any(
        srow[:, :, None] == jnp.where(surviving, old, -2)[:, None, :],
        axis=2)
    self_hit = srow == chunk_ids[:, None]
    removed_hit = rmask[jnp.clip(srow, 0, C - 1)]
    key = jnp.where(sr_valid, srow, -1)
    order = jnp.argsort(key, axis=1, stable=True)
    skey = jnp.take_along_axis(key, order, axis=1)
    sdup = jnp.concatenate(
        [jnp.zeros((B, 1), bool), skey[:, 1:] == skey[:, :-1]], axis=1)
    dup_self = jnp.zeros_like(sdup).at[
        jnp.arange(B)[:, None], order].set(sdup)
    sr_valid = sr_valid & ~dup_old & ~self_hit & ~removed_hit & ~dup_self

    cand = jnp.concatenate([jnp.where(surviving, old, -1),
                            jnp.where(sr_valid, srow, -1)], axis=1)
    sel, cnt = _prune_rows(cfg, state.vlo, state.norms, chunk_ids, cand,
                           ok, max_deg)
    selpad = jnp.full((B, K), -1, jnp.int32).at[:, :max_deg].set(sel)
    rowd = jnp.where(ok, chunk_ids, C)
    nbr = state.nbr.at[layer, rowd].set(selpad, mode="drop")
    deg = state.deg.at[layer, rowd].set(cnt, mode="drop")
    return state._replace(nbr=nbr, deg=deg)


def remove_from_state(cfg: GraphConfig, state: GraphState, arr,
                      remove_ef: int, remove_buckets=(1, 64, 512),
                      affected_chunk: int = 1024,
                      exact_candidates: bool | None = None):
    """Host-driven removal of ``arr`` (numpy int32 ids) from a GraphState.

    The engine core of HNSWIndex.remove, reusable for per-shard removal in
    the sharded index.  Returns the new state; callers own free-list /
    count bookkeeping.  ``exact_candidates`` selects MXU brute-force repair
    candidates (defaults to on for built-in metrics — exact and cheaper
    than per-node beams at any corpus the exact build path also serves)."""
    import numpy as np

    from ..ops import distance as dst

    arr = np.asarray(arr, dtype=np.int32).ravel()
    if arr.size == 0:
        return state
    if exact_candidates is None:
        exact_candidates = not dst.is_custom(cfg.metric)
    lvl = np.asarray(state.level)
    max_iters = cfg.search_iter_factor * remove_ef + 16

    def bucket(n):
        for b in remove_buckets:
            if n <= b:
                return b
        return remove_buckets[-1]

    for start in range(0, arr.size, remove_buckets[-1]):
        wave = arr[start:start + remove_buckets[-1]]
        b = bucket(wave.size)
        rem = np.full(b, -1, dtype=np.int32)
        rem[:wave.size] = wave
        rem_j = jnp.asarray(rem)

        state = mark_removed(cfg, state, rem_j)
        top = int(lvl[wave].max())
        aff_all = np.asarray(affected_masks_all(cfg, state, rem_j))
        for l in range(top, -1, -1):
            layer = jnp.asarray(l, jnp.int32)
            if exact_candidates:
                scand = exact_repair_candidates(cfg, state, rem_j, layer,
                                                remove_ef)
            else:
                scand = repair_candidates(cfg, state, rem_j, layer,
                                          remove_ef, max_iters)
            aff = np.flatnonzero(aff_all[l])
            max_deg = cfg.max_degree(l == 0)
            for cstart in range(0, aff.size, affected_chunk):
                chunk = aff[cstart:cstart + affected_chunk]
                cpad = np.full(affected_chunk, -1, dtype=np.int32)
                cpad[:chunk.size] = chunk
                state = repair_chunk(cfg, state, jnp.asarray(cpad), rem_j,
                                     scand, layer, max_deg)
        state = clear_removed_rows_all(cfg, state, rem_j)
    return state
