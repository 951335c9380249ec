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

def _env_int(name: str, default: int) -> int:
    import os
    return int(os.environ.get(name, str(default)))


#: Per affected node, union repair candidates of up to this many of its
#: removed neighbors (covers the reference's per-in-edge union for all but
#: pathological rows where most of a node's edges died in one wave).
#: Env-overridable (HNSW_REPAIR_*) for quality/cost sweeps.
REPAIR_FANIN = _env_int("HNSW_REPAIR_FANIN", 4)

#: Columns of each removed node's candidate list entering the union (the
#: nearest ones; bounds the heuristic-prune width at K + FANIN * SPAN).
REPAIR_SPAN = _env_int("HNSW_REPAIR_SPAN", 32)

#: Span for the fan-in-1 fast tier: affected rows that lost exactly one
#: neighbor (the overwhelming majority when wave << corpus) repair against
#: surviving-old ∪ that one neighbor's candidates — the same reference
#: union (GraphConnector.cs:100-131), at a quarter of the prune width and
#: ~10x less pairwise-distance work.
REPAIR_SPAN_1 = _env_int("HNSW_REPAIR_SPAN_1", 48)

#: Repair fill floor, as edges (0 disables).  After the heuristic prune,
#: repaired rows that came back with fewer than this many edges are
#: topped up with their nearest rejected candidates
#: (heuristic.prune fill_to — hnswlib keepPrunedConnections; the
#: reference heuristic never fills, so this is a deliberate
#: quality-over-parity extension for bulk deletes, where rows near a
#: removed hub lose most of their union to the relative-neighbor rule
#: and the graph erodes).  Clamped to the layer cap at dispatch.
REPAIR_FILL = _env_int("HNSW_REPAIR_FILL", 0)


def resolve_quality(quality: str, n_remove: int, live_count: int) -> str:
    """Resolve the "auto" remove_quality preset.

    Bulk deletes (wave >= 10% of the live corpus) are the drift-prone
    regime — the 100k x 50% sweep measured post/pre recall 0.96 under
    "fast" vs 0.995 under "high" — so auto escalates them to "high" and
    keeps incremental churn (near-driftless either way) on "fast".  This
    makes the reference's own bulk-removal drift bar
    (GraphTests.cs:138-148, >= 0.98x) pass out of the box without taxing
    steady-state churn with 1.75x slower repairs."""
    if quality != "auto":
        return quality
    return "high" if 10 * n_remove >= max(1, live_count) else "fast"


def repair_widths(quality: str):
    """Resolve (fanin, span, span_1, fill) for a remove_quality preset.

    "fast" is the REPAIR_* constants; "high" doubles both candidate spans
    and widens the multi-loss fan-in union — measured at 100k x 50%
    uniform bulk deletes to lift post/pre recall from ~0.96 to ~0.995
    (above the reference's 0.98x drift bar, GraphTests.cs:138-148) at
    ~0.57x the removals/s (benchmarks/remove_quality_sweep.py).  The
    HNSW_REPAIR_* env overrides scale with the preset."""
    if quality == "high":
        return (max(REPAIR_FANIN + 2, 6), 2 * REPAIR_SPAN,
                2 * REPAIR_SPAN_1, REPAIR_FILL)
    return (REPAIR_FANIN, REPAIR_SPAN, REPAIR_SPAN_1, REPAIR_FILL)


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
    # EP's top layer.  The top layer is traced, so gather from both the
    # base and upper tables and select (the upper row is padded to the
    # base width).
    ep_lvl = jnp.clip(state.level[epc], 0, L - 1)
    K0 = state.nbr0.shape[1]
    Ku = state.nbru.shape[2]
    row_u = state.nbru[jnp.clip(ep_lvl - 1, 0, L - 2), epc]   # (Ku,)
    row_u = jnp.concatenate(
        [row_u, jnp.full((K0 - Ku,), -1, jnp.int32)])
    row = jnp.where(ep_lvl == 0, state.nbr0[epc], row_u)      # (K0,)
    rowc = jnp.clip(row, 0, C - 1)
    surv = (row >= 0) & active[rowc]
    deg_u = state.degu[jnp.clip(ep_lvl - 1, 0, L - 2), rowc]
    deg_at = jnp.where(ep_lvl == 0, state.deg0[rowc], deg_u)
    score = jnp.where(surv, deg_at, -1)
    nb_best = row[jnp.argmax(score)]
    has_nb = jnp.any(surv)

    # ForceReplaceEntryPoint: highest-level active node
    lv_eff = jnp.where(active, state.level, -1)
    scan_best = jnp.argmax(lv_eff).astype(jnp.int32)

    new_ep = jnp.where(has_nb, nb_best, scan_best).astype(jnp.int32)
    new_ep = jnp.where(count > 0, new_ep, -1)
    ep = jnp.where(ep_removed, new_ep, ep)
    return state._replace(active=active, ep=ep, count=count)


@partial(jax.jit, static_argnames=("cfg", "layer", "remove_ef",
                                   "max_iters"))
def repair_candidates(cfg: GraphConfig, state: GraphState, scan_ids,
                      rem_ids, layer: int, remove_ef: int, max_iters: int):
    """Beam search around each removed node at ``layer``
    (GraphConnector.cs:96), starting from the removed node itself, with
    the whole removal wave (``rem_ids``) excluded from results.
    ``scan_ids`` is the wave compacted to the nodes living on ``layer``
    (-1 padded) — upper layers hold a vanishing fraction of any wave, so
    scanning only them avoids full-wave work per layer.
    Returns (len(scan_ids), remove_ef) ids."""
    C = state.capacity
    rmask = _removed_mask(state, rem_ids)
    q = state.vectors[jnp.clip(scan_ids, 0, C - 1)]
    qn = state.norms[jnp.clip(scan_ids, 0, C - 1)]
    on_layer = scan_ids >= 0
    _, ids = beam_search(cfg, state, q, qn, scan_ids, on_layer, layer,
                         remove_ef, max_iters, filtered=True,
                         filter_mask=~rmask)
    return ids


@partial(jax.jit, static_argnames=("cfg", "remove_ef", "nscan"))
def exact_repair_candidates(cfg: GraphConfig, state: GraphState, scan_ids,
                            layer, remove_ef: int,
                            nscan: int | None = None):
    """Exact repair candidates: one masked MXU scan of the layer's
    population per removed node (the exact form of the reference's beam at
    GraphConnector.cs:96; the wave is already inactive so removed nodes
    exclude themselves).  ``scan_ids`` is the wave compacted to the nodes
    living on ``layer``.  Past 1M rows the scan runs two-stage (bf16
    coarse + f32 rescore, ops/bruteforce.exact_knn2).  ``nscan`` bounds
    the scan to the slot prefix actually built (the host's bucketed
    high-water mark, same scheme as construct.base_connect_exact): with
    capacity preallocated at the final corpus size a full-width scan pays
    the 8M-row cost on a 100k-row index, and a power-of-2 prefix keeps
    the fused lane-min scan's alignment requirement satisfied at
    capacities that are not multiples of 8192.  Returns
    (len(scan_ids), remove_ef) ids."""
    from ..ops.bruteforce import exact_knn, exact_knn2

    C = state.capacity
    ns = C if nscan is None else min(nscan, C)
    q = state.vectors[jnp.clip(scan_ids, 0, C - 1)]
    allowed = (state.active & (state.level >= layer))[:ns]
    ct = state.coarse_table
    if ct is not None and C >= (1 << 20):
        # repair only consumes a REPAIR_SPAN prefix of the candidates, so
        # a narrow survivor floor suffices — the (wave, S)-row rescore
        # gather is row-count-bound and was the scan's dominant cost
        _, ids = exact_knn2(cfg.metric, state.vectors, ct[:ns],
                            state.norms[:ns], allowed, q, remove_ef,
                            oversample=2, survivor_floor=64)
    else:
        _, ids = exact_knn(cfg.metric, state.vlo[:ns], state.norms[:ns],
                           allowed, q, remove_ef)
    return jnp.where(scan_ids[:, None] >= 0, ids, -1)


@partial(jax.jit, static_argnames=("cfg",))
def affected_masks_all(cfg: GraphConfig, state: GraphState, rem_ids):
    """(L, C) affected + multi-loss masks for every layer in one pass.

    Edges into removed nodes are never *added* during repair, so the
    per-layer in-neighbor sets depend only on the pre-repair state — one
    table scan + one host readback serves the whole wave (each readback
    costs ~35 ms through remote runtimes).  Returns ``(affected, multi)``
    as bit-packed ``(L, ceil(C/8)) uint8`` arrays (``jnp.packbits`` along
    the row axis): the masks exist only to cross the host boundary, and
    packing cuts the transfer 8x — at 8M rows the raw (L, C) bool pair
    is ~128 MB, multi-second through remote relays.  ``multi`` marks rows
    that lost 2+ neighbors and need the wide repair union; everyone else
    takes the fan-in-1 fast tier.

    Scanned in bounded row blocks sliced straight off the tables: using a
    whole (C, K) slice as one gather-index tensor makes XLA materialize
    it in a lane-padded layout (4x HBM — OOM at 8M rows); per-block
    dynamic slices cap the transient at block size."""
    from .graph import nbr_slice

    C = state.capacity
    rmask = _removed_mask(state, rem_ids)
    blocks = max(1, C >> 19)          # <= 512k rows per step
    rows = -(-C // blocks)            # ceil: cover the tail at non-pow2 C
    # (dynamic_slice/update clamp the final block's start to C - rows, so
    # the overlap rows are just recomputed — values don't depend on acc)
    aff, mul = [], []
    for l in range(state.num_levels):
        nbr_l, _ = nbr_slice(state, l)
        K = nbr_l.shape[1]

        def body(i, acc, nbr_l=nbr_l, K=K):
            blk = lax.dynamic_slice(nbr_l, (i * rows, 0), (rows, K))
            hit = (blk >= 0) & rmask[jnp.clip(blk, 0, C - 1)]
            nh = jnp.sum(hit, axis=1, dtype=jnp.int32)
            return lax.dynamic_update_slice(acc, nh, (i * rows,))

        nhit = lax.fori_loop(0, blocks, body, jnp.zeros((C,), jnp.int32))
        a = (nhit > 0) & state.active
        aff.append(a)
        mul.append(a & (nhit >= 2))
    return (jnp.packbits(jnp.stack(aff), axis=-1),
            jnp.packbits(jnp.stack(mul), axis=-1))


@partial(jax.jit, donate_argnames=("nbr_l", "deg_l"))
def _clear_rows_slice(nbr_l, deg_l, rem_ids):
    """Erase removed nodes' out-edges in one layer's (C, K) slice.

    Runs on the per-layer slice inside the repair flow: scatter-only
    programs against the full (L, C, K) table make XLA materialize a
    transposed copy of the whole table at 8M rows."""
    C = nbr_l.shape[0]
    rowd = jnp.where(rem_ids >= 0, rem_ids, C)
    blank = jnp.full((rem_ids.shape[0], nbr_l.shape[1]), -1, jnp.int32)
    return (nbr_l.at[rowd].set(blank, mode="drop"),
            deg_l.at[rowd].set(0, mode="drop"))


@partial(jax.jit, static_argnames=("cfg", "max_deg", "fanin", "span",
                                   "fill"),
         donate_argnames=("nbr_l", "deg_l"))
def repair_chunk(cfg: GraphConfig, vlo, norms, nbr_l, deg_l, chunk_ids,
                 rem_ids, scan_ids, scand, max_deg: int,
                 fanin: int = REPAIR_FANIN, span: int = REPAIR_SPAN,
                 fill: int = 0):
    """Re-select edges for a chunk of affected nodes at one layer.

    Operates on the layer's (C, K) table slice (``nbr_l``/``deg_l``,
    donated and updated in place — shipping the whole (L, C, K) table
    through every chunk program costs full-table copies at 8M rows);
    the host slices once per (wave, layer) and writes the slice back.

    ``chunk_ids (B,)`` affected nodes (-1 pad); ``rem_ids (R,)`` the whole
    removal wave; ``scan_ids (S,)`` the wave compacted to this layer's
    population, whose repair candidates are the rows of ``scand (S, E)``.
    Any removed neighbor seen at this layer lives on it (neighbors of a
    layer-l row all have level >= l), so every lookup hits ``scan_ids``.
    Candidate set per node = surviving old neighbors ∪ repair candidates
    of each of its removed neighbors (up to ``fanin`` of them, ``span``
    candidates each), deduplicated and excluding itself / removed nodes
    (GraphConnector.cs:100-131).  The host dispatches rows that lost
    exactly one neighbor with ``fanin=1`` (a quarter of the prune width);
    multi-loss rows take the wide variant.  Returns (nbr_l, deg_l)."""
    B = chunk_ids.shape[0]
    C = nbr_l.shape[0]
    K = nbr_l.shape[1]
    rmask = jnp.zeros((C + 1,), bool).at[
        jnp.where(rem_ids >= 0, rem_ids, C)].set(True)[:C]
    # position of each on-layer removed id in scand; -1 = not present
    # (defensive: such ids contribute no candidates instead of row 0's)
    R = scan_ids.shape[0]
    rpos = jnp.full((C + 1,), -1, jnp.int32).at[
        jnp.where(scan_ids >= 0, scan_ids, C)].set(
            jnp.arange(R, dtype=jnp.int32))
    rpos = rpos.at[C].set(-1)

    ok = chunk_ids >= 0
    uc = jnp.clip(chunk_ids, 0, C - 1)
    old = nbr_l[uc]                                     # (B, K)
    old_valid = (old >= 0) & ok[:, None]
    oldc = jnp.clip(old, 0, C - 1)
    old_removed = old_valid & rmask[oldc]
    surviving = old_valid & ~old_removed

    # up to ``fanin`` removed neighbors per row, their candidate spans
    T = min(fanin, K)
    E = min(span, scand.shape[1])
    slot_rank = jnp.argsort(~old_removed, axis=1, stable=True)[:, :T]
    vids = jnp.take_along_axis(old, slot_rank, axis=1)           # (B, T)
    v_ok = jnp.take_along_axis(old_removed, slot_rank, axis=1)
    rp = rpos[jnp.clip(vids, 0, C)]                              # (B, T)
    v_ok = v_ok & (rp >= 0)
    srow = scand[jnp.clip(rp, 0, R - 1)][:, :, :E]               # (B, T, E)
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
    sel, cnt = _prune_rows(cfg, vlo, norms, chunk_ids, cand, ok, max_deg,
                           fill_to=fill)
    selpad = jnp.full((B, K), -1, jnp.int32).at[:, :max_deg].set(sel)
    rowd = jnp.where(ok, chunk_ids, C)
    nbr_l = nbr_l.at[rowd].set(selpad, mode="drop")
    deg_l = deg_l.at[rowd].set(cnt, mode="drop")
    return nbr_l, deg_l


#: Affected-row chunk ladder: rows are padded to the smallest fitting
#: bucket so a handful of compilations serve any affected-set size.
CHUNK_BUCKETS = (1024, 4096)


@partial(jax.jit, static_argnames=("layer",))
def _slice_layer(state: GraphState, layer: int):
    from .graph import nbr_slice
    return nbr_slice(state, layer)


@partial(jax.jit, static_argnames=("layer",),
         donate_argnames=("state", "nbr_l", "deg_l"))
def _writeback_layer(state: GraphState, nbr_l, deg_l, layer: int):
    from .graph import with_nbr_slice
    return with_nbr_slice(state, layer, nbr_l, deg_l)


def _repair_rows(cfg, vlo, norms, nbr_l, deg_l, rows, rem_j, scan_j,
                 scand, max_deg: int, fanin: int, span: int,
                 fill: int = 0):
    """Dispatch ``rows`` through repair_chunk in bucketed chunks,
    threading the donated layer slices."""
    import numpy as np

    i = 0
    while i < rows.size:
        take = rows[i:i + CHUNK_BUCKETS[-1]]
        b = next(cb for cb in CHUNK_BUCKETS if cb >= min(
            take.size, CHUNK_BUCKETS[-1]))
        cpad = np.full(b, -1, dtype=np.int32)
        cpad[:take.size] = take
        nbr_l, deg_l = repair_chunk(cfg, vlo, norms, nbr_l, deg_l,
                                    jnp.asarray(cpad), rem_j, scan_j,
                                    scand, max_deg, fanin, span,
                                    min(fill, max_deg))
        i += take.size
    return nbr_l, deg_l


def remove_from_state(cfg: GraphConfig, state: GraphState, arr,
                      remove_ef: int, remove_buckets=None,
                      exact_candidates: bool | None = None,
                      scan_hwm: int | None = None,
                      quality: str = "fast"):
    """Host-driven removal of ``arr`` (numpy int32 ids) from a GraphState.

    The engine core of HNSWIndex.remove, reusable for per-shard removal in
    the sharded index.  Returns the new state; callers own free-list /
    count bookkeeping.  ``exact_candidates`` selects MXU brute-force repair
    candidates (defaults to on for built-in metrics — exact and cheaper
    than per-node beams at any corpus the exact build path also serves).

    Affected rows are repaired in two tiers: rows that lost exactly one
    neighbor (the overwhelming majority when wave << corpus) union only
    that neighbor's candidates (fanin=1 — narrow prune, ~10x less pairwise
    work); rows that lost several use the wide REPAIR_FANIN union."""
    import numpy as np

    from ..ops import distance as dst

    arr = np.asarray(arr, dtype=np.int32).ravel()
    if arr.size == 0:
        return state
    if quality == "auto":
        # callers with a host count mirror resolve before calling (a
        # device count readback costs ~35 ms through remote relays);
        # this is the defensive path for direct engine users
        quality = resolve_quality(quality, arr.size, int(state.count))
    r_fanin, r_span, r_span1, r_fill = repair_widths(quality)
    if exact_candidates is None:
        exact_candidates = not dst.is_custom(cfg.metric)
    # candidate-scan prefix: smallest power of 2 covering the built slots
    # (keeps the fused-scan 8192-row alignment; one bucket per doubling
    # bounds recompiles exactly like construction's nscan ladder)
    ns = state.capacity
    if scan_hwm is not None:
        p = 8192
        while p < scan_hwm:
            p <<= 1
        ns = min(p, state.capacity)
    if remove_buckets is None:
        # The whole removal set in ONE wave wherever memory allows: each
        # wave re-repairs every row it affects, so splitting a big delete
        # into waves repeats repair work on overlapping in-neighbor sets
        # (and pays a mask readback per wave).  The candidate scan's
        # survivor buffers scale with wave x corpus-blocks, so huge
        # corpora cap the wave instead.
        cap = 32768 if state.capacity <= (1 << 21) else 4096
        remove_buckets = (8, 64, 512, 4096, cap)
    # levels of the removed ids only — a full (C,) level mirror costs a
    # multi-second readback at 8M rows through remote relays
    lvl_arr = np.asarray(state.level[jnp.asarray(arr)])
    max_iters = cfg.search_iter_factor * remove_ef + 16

    def bucket(n):
        for b in remove_buckets:
            if n <= b:
                return b
        return remove_buckets[-1]

    for start in range(0, arr.size, remove_buckets[-1]):
        wave = arr[start:start + remove_buckets[-1]]
        wave_lvl = lvl_arr[start:start + remove_buckets[-1]]
        b = bucket(wave.size)
        rem = np.full(b, -1, dtype=np.int32)
        rem[:wave.size] = wave
        rem_j = jnp.asarray(rem)

        state = mark_removed(cfg, state, rem_j)
        top = int(wave_lvl.max())
        aff_j, multi_j = affected_masks_all(cfg, state, rem_j)
        C = state.capacity
        aff_all = np.unpackbits(np.asarray(aff_j), axis=-1)[:, :C] \
            .astype(bool)
        multi_all = np.unpackbits(np.asarray(multi_j), axis=-1)[:, :C] \
            .astype(bool)
        for l in range(top, -1, -1):
            # candidate scans cover only the wave members on this layer —
            # upper layers hold ~1/M^l of the wave, and a full-wave exact
            # scan per layer would triple the wave's corpus-scan cost
            if l == 0:
                scan_j = rem_j
            else:
                on_l = wave[wave_lvl >= l]
                sb = bucket(on_l.size)
                spad = np.full(sb, -1, dtype=np.int32)
                spad[:on_l.size] = on_l
                scan_j = jnp.asarray(spad)
            if exact_candidates:
                scand = exact_repair_candidates(
                    cfg, state, scan_j, jnp.asarray(l, jnp.int32),
                    remove_ef, ns)
            else:
                scand = repair_candidates(cfg, state, scan_j, rem_j, l,
                                          remove_ef, max_iters)
            max_deg = cfg.max_degree(l == 0)
            fast = np.flatnonzero(aff_all[l] & ~multi_all[l])
            slow = np.flatnonzero(multi_all[l])
            nbr_l, deg_l = _slice_layer(state, l)
            nbr_l, deg_l = _repair_rows(cfg, state.vlo, state.norms,
                                        nbr_l, deg_l, fast, rem_j, scan_j,
                                        scand, max_deg, 1, r_span1, r_fill)
            nbr_l, deg_l = _repair_rows(cfg, state.vlo, state.norms,
                                        nbr_l, deg_l, slow, rem_j, scan_j,
                                        scand, max_deg, r_fanin,
                                        r_span, r_fill)
            # removed nodes' own rows at this layer die with the repair
            # pass (the repair search above never traverses edges, so
            # ordering is safe)
            nbr_l, deg_l = _clear_rows_slice(nbr_l, deg_l, rem_j)
            state = _writeback_layer(state, nbr_l, deg_l, l)
    return state
