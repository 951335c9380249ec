"""Wave-batched removal with graph repair.

TPU-native replacement for the reference's deletion path
(src/HNSWIndex/GraphConnector.cs:53-167 + GraphLocker.cs).  The reference
removes one node at a time under a neighborhood region lock; the TPU build
removes a *wave* of nodes functionally:

1. mark the wave inactive and fix the entry point
   (ReplaceEntryPointIfNeeded, GraphConnector.cs:72-85 — we always use the
   ForceReplaceEntryPoint strategy of promoting the highest-level active
   node, GraphData.cs:172-189);
2. per layer, top to bottom (GraphConnector.cs:59):
   a. beam-search ``remove_max_candidates`` repair candidates around every
      removed node that lives on the layer, excluding removed nodes from
      results (GraphConnector.cs:96 + the IsRemoved link guard at :152-155);
   b. find every *affected* node — an active node with an out-edge into the
      wave.  The reference walks the removed node's maintained in-edge
      lists (Node.InEdges); the TPU build keeps no in-edge storage and
      instead recovers in-neighbors exactly with one vectorized membership
      scan over the layer's out-edge table;
   c. for each affected node: candidate set = (surviving old neighbors) ∪
      (repair candidates of its first removed neighbor), deduplicated
      (GraphConnector.cs:113-129), re-pruned with the heuristic to the
      layer cap (GraphConnector.cs:131) and written back;
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


def _removed_mask(state: GraphState, rem_ids):
    C = state.capacity
    return jnp.zeros((C + 1,), bool).at[
        jnp.where(rem_ids >= 0, rem_ids, C)].set(True)[:C]


@partial(jax.jit, static_argnames=("cfg",), donate_argnames=("state",))
def mark_removed(cfg: GraphConfig, state: GraphState, rem_ids):
    """Deactivate a removal wave and fix the entry point / count.

    Mirrors the IsRemoved flagging (GraphConnector.cs:55-57) plus entry
    point replacement (GraphConnector.cs:72-85): if the entry point is
    removed, the highest-level surviving active node takes over; an empty
    graph gets ep = -1 (GraphConnector.cs:78-81)."""
    rmask = _removed_mask(state, rem_ids)
    n_rem = jnp.sum(rmask & state.active, dtype=jnp.int32)
    active = state.active & ~rmask
    count = state.count - n_rem

    ep = state.ep
    ep_removed = (ep >= 0) & rmask[jnp.clip(ep, 0, None)]
    lv_eff = jnp.where(active, state.level, -1)
    best = jnp.argmax(lv_eff).astype(jnp.int32)
    new_ep = jnp.where(count > 0, best, -1).astype(jnp.int32)
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


@partial(jax.jit, static_argnames=("cfg", "max_deg", "remove_ef"),
         donate_argnames=("state",))
def repair_chunk(cfg: GraphConfig, state: GraphState, chunk_ids, rem_ids,
                 scand, layer, max_deg: int, remove_ef: int):
    """Re-select edges for a chunk of affected nodes at ``layer``.

    ``chunk_ids (B,)`` affected nodes (-1 pad); ``rem_ids (R,)`` the removal
    wave; ``scand (R, remove_ef)`` their repair candidates.  Candidate set
    per node = surviving old neighbors ∪ repair candidates of its first
    removed neighbor, deduplicated and excluding itself / removed nodes
    (GraphConnector.cs:100-131)."""
    B = chunk_ids.shape[0]
    C = state.capacity
    K = state.nbr.shape[2]
    layer = jnp.asarray(layer, jnp.int32)
    rmask = _removed_mask(state, rem_ids)
    # position of each removed id in the wave, for scand lookup
    R = rem_ids.shape[0]
    rpos = jnp.zeros((C + 1,), jnp.int32).at[
        jnp.where(rem_ids >= 0, rem_ids, C)].set(jnp.arange(R, dtype=jnp.int32))

    ok = chunk_ids >= 0
    uc = jnp.clip(chunk_ids, 0, C - 1)
    nbr_l = lax.dynamic_index_in_dim(state.nbr, layer, 0, keepdims=False)
    old = nbr_l[uc]                                     # (B, K)
    old_valid = (old >= 0) & ok[:, None]
    oldc = jnp.clip(old, 0, C - 1)
    old_removed = old_valid & rmask[oldc]
    surviving = old_valid & ~old_removed

    first_r = old[jnp.arange(B), jnp.argmax(old_removed, axis=1)]
    has_r = jnp.any(old_removed, axis=1)
    srow = scand[rpos[jnp.clip(first_r, 0, C)]]          # (B, remove_ef)
    # dedupe repair candidates against surviving old neighbors and self
    sr_valid = (srow >= 0) & has_r[:, None] & ok[:, None]
    dup = jnp.any(
        (srow[:, :, None] == jnp.where(surviving, old, -2)[:, None, :]),
        axis=2)
    self_hit = srow == chunk_ids[:, None]
    removed_hit = rmask[jnp.clip(srow, 0, C - 1)]
    sr_valid = sr_valid & ~dup & ~self_hit & ~removed_hit

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
                      remove_ef: int, remove_buckets=(1, 16, 64),
                      affected_chunk: int = 256):
    """Host-driven removal of ``arr`` (numpy int32 ids) from a GraphState.

    The engine core of HNSWIndex.remove, reusable for per-shard removal in
    the sharded index.  Returns the new state; callers own free-list /
    count bookkeeping."""
    import numpy as np

    arr = np.asarray(arr, dtype=np.int32).ravel()
    if arr.size == 0:
        return state
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
            scand = repair_candidates(cfg, state, rem_j, layer, remove_ef,
                                      max_iters)
            aff = np.flatnonzero(aff_all[l])
            max_deg = cfg.max_degree(l == 0)
            for cstart in range(0, aff.size, affected_chunk):
                chunk = aff[cstart:cstart + affected_chunk]
                cpad = np.full(affected_chunk, -1, dtype=np.int32)
                cpad[:chunk.size] = chunk
                state = repair_chunk(cfg, state, jnp.asarray(cpad), rem_j,
                                     scand, layer, max_deg, remove_ef)
        state = clear_removed_rows_all(cfg, state, rem_j)
    return state
