"""Wave-batched graph construction.

TPU-native replacement for the reference's insert path
(src/HNSWIndex/GraphConnector.cs:24-262 + GraphData.cs:79-118).  The
reference inserts one item at a time under fine-grained locks
(``Parallel.For`` over ``Add``, HNSWIndex.cs:70-78); the TPU build batches
inserts into *waves*: every wave member searches the frozen pre-wave graph,
edges are selected with the batched heuristic, and all mutations are applied
as conflict-free array scatters.  Within one wave, per layer:

1. greedy descent to each member's top connect layer
   (FindEntryPoint, GraphConnector.cs:174);
2. beam search with ef = MaxCandidates (GraphConnector.cs:189);
3. relative-neighbor pruning to M (2*M at layer 0)
   (GraphConnector.cs:190, Heuristic.cs:11);
4. forward-edge row writes (GraphConnector.cs:192);
5. reverse edges u -> v for every selected neighbor v, applied with a
   sort-and-rank conflict-free scatter, followed by a batched re-prune of
   any node whose degree overflowed (GraphConnector.cs:196-214, PruneOverflow
   :222-262).

Wave members never see each other's edges at the same layer (search of
layer l happens before the wave's layer-l scatter), so the result is
order-independent within a wave — the TPU analog of the reference's "all
concurrent inserts see some consistent graph" contract.

Entry-point promotion: the wave member with the highest sampled level
replaces the entry point if it exceeds the old top layer
(GraphConnector.cs:36-41; ties resolved to the first such member).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from ..ops import distance as dst
from . import heuristic
from .graph import (GraphConfig, GraphState, update_coarse,
                    update_vlo)
from .search import beam_search, greedy_descent

_INF = jnp.inf
_PRUNE_CHUNK = 1024

def _env_int(name: str, default: int) -> int:
    import os
    return int(os.environ.get(name, str(default)))


#: Scan-prefix size from which FULL-WIDTH steady waves run the candidate
#: scan two-stage (bf16 coarse + f32 rescore, ops/bruteforce.exact_knn2 —
#: the fused streaming lane-min form when the prefix is 8192-aligned)
#: instead of the blocked single-stage exact_knn.  The blocked form
#: issues one narrow approx_min_k per 64k corpus block plus a
#: (W, 16*4k)-survivor argsort merge: at nscan=1M that measured ~21 ms
#: of the ~40 ms wave vs ~8 ms for the fused scan
#: (benchmarks/wave_phase_probe.py, 2026-08-19).  Env
#: HNSW_BUILD_SCAN2_MIN; see the ``scan2`` gate in base_connect_exact
#: for why only the steady bucket takes it below the always-on mark.
#: The gate compares the STATIC PREFIX (nscan clamped to capacity), not
#: capacity: a 1M corpus allocates ~1.008M rows (8192-aligned), and a
#: capacity gate at 1<<20 left the fused scan off at exactly the
#: headline-bench scale (9.8k vs 16.7k inserts/s).
BUILD_SCAN2_MIN = _env_int("HNSW_BUILD_SCAN2_MIN", 1 << 19)


def _prune_rows(cfg: GraphConfig, vectors, norms, target_ids, cand_ids,
                mask, max_deg: int, fill_to: int = 0):
    """Heuristic-prune candidate lists against their target nodes.

    ``target_ids (P,)``, ``cand_ids (P, NC)`` (-1 invalid), ``mask (P,)``
    gates rows.  Distances are computed candidate->target (the reference's
    PruneOverflow / removal-repair orientation, GraphConnector.cs:233,118).
    Processed in chunks via ``lax.map`` to bound the gathered-vector
    footprint.  ``fill_to`` tops under-connected rows back up from their
    rejected candidates (removal repair only — see heuristic.prune).
    Returns (sel (P, max_deg) i32, count (P,) i32)."""
    P, NC = cand_ids.shape
    C = vectors.shape[0]
    # each lax.map chunk carries ~2-3 ms of fixed small-op latency
    # (argsort, accept scan, compaction) and the chunks run serially, so
    # take the widest chunk whose transients stay bounded: the
    # (chunk, NC, D) candidate-vector gather at ~128 MB (the (chunk, NC,
    # NC) conflict tensors are smaller at any NC <= ~2*D)
    D = vectors.shape[1]
    row_bytes = NC * D * vectors.dtype.itemsize
    chunk = min(P, 8192,
                max(_PRUNE_CHUNK, (128 << 20) // max(1, row_bytes)))
    n_chunks = -(-P // chunk)
    pad = n_chunks * chunk - P

    t = jnp.pad(target_ids, (0, pad))
    ci = jnp.pad(cand_ids, ((0, pad), (0, 0)), constant_values=-1)
    mk = jnp.pad(mask, (0, pad))

    def one_chunk(args):
        tc, cic, mkc = args
        tcc = jnp.clip(tc, 0, C - 1)
        tvec = vectors[tcc]
        tn = norms[tcc]
        ccc = jnp.clip(cic, 0, C - 1)
        cvecs = vectors[ccc]
        cn = norms[ccc]
        cd = dst.gathered(cfg.metric, tvec, tn, cvecs, cn)
        cd = jnp.where((cic >= 0) & mkc[:, None], cd, _INF)
        return heuristic.prune(cfg.metric, jnp.where(mkc[:, None], cic, -1),
                               cd, cvecs, cn, max_deg, fill_to=fill_to)

    sel, cnt = lax.map(one_chunk, (t.reshape(n_chunks, chunk),
                                   ci.reshape(n_chunks, chunk, NC),
                                   mk.reshape(n_chunks, chunk)))
    return sel.reshape(-1, max_deg)[:P], cnt.reshape(-1)[:P]


#: Compact the overflow re-prune's row set before pruning.  The re-prune
#: is the single largest wave cost (~45 of ~78 ms per 512-wave at 1M —
#: benchmarks/RESULTS.md "standalone kernel attribution") and only the
#: ~start_density * overflow fraction of the P pair lanes need work;
#: compaction runs the whole prune chain (gather, pairwise einsum,
#: argsorts, accept scan) at a fraction of the rows.  The fraction is the
#: static lane budget as a multiple of P/8; a lax.cond falls back to the
#: full-width prune on waves whose overflow count exceeds the budget.
#: Measured at 1M clustered on v5e (benchmarks/RESULTS.md round-3 A/B):
#: NUM=0 4957/s, NUM=4 6009/s, NUM=6 6782/s steady — overflow-start
#: density runs ~60% of P, so budgets below 5/8 fall back to the
#: full-width prune on most waves and only pay the argsort.  With layer-0
#: slack (cfg.slack0 > 0) overflows fire ~(slack0+1)x less often, so the
#: default budget drops to P/8 (the cond falls back to full width on the
#: rare dense wave).  None = auto; the env var pins a value for A/Bs.
_RCN_ENV = __import__("os").environ.get("HNSW_REVERSE_COMPACT_NUM")
REVERSE_COMPACT_NUM = None if _RCN_ENV is None else int(_RCN_ENV)


def _reverse_budget(cfg: GraphConfig, P: int) -> int:
    num = REVERSE_COMPACT_NUM
    if num is None:
        num = 6 if cfg.slack0 == 0 else 1
    return (P * num) // 8


def _prune_rows_compact(cfg: GraphConfig, vlo, norms, target_ids, cand_ids,
                        mask, max_deg: int, budget: int):
    """_prune_rows on the compacted ``mask`` rows (static ``budget``
    lanes), scattered back to full width; falls back to the full-width
    prune when more rows are masked than the budget holds.  Rows outside
    ``mask`` return (-1 row, 0) either way."""
    P = mask.shape[0]
    if budget <= 0 or budget >= P:
        return _prune_rows(cfg, vlo, norms, target_ids, cand_ids, mask,
                           max_deg)
    order = jnp.argsort(~mask, stable=True)
    nt = jnp.sum(mask, dtype=jnp.int32)

    def compacted(_):
        take = order[:budget]
        selc, cntc = _prune_rows(cfg, vlo, norms, target_ids[take],
                                 cand_ids[take], mask[take], max_deg)
        sel = jnp.full((P, max_deg), -1, jnp.int32).at[take].set(selc)
        cnt = jnp.zeros((P,), jnp.int32).at[take].set(cntc)
        return sel, cnt

    def full(_):
        return _prune_rows(cfg, vlo, norms, target_ids, cand_ids, mask,
                           max_deg)

    return lax.cond(nt <= budget, compacted, full, None)


def _add_reverse(cfg: GraphConfig, vlo, norms, nbr_l, deg_l, src_ids, sel,
                 mask, max_deg: int):
    """Add back-edges v -> u for every forward edge u -> v in the wave.

    Conflict-free parallel append: the (u, v) pair list is sorted by target
    v and ranked within each group; each target's whole new row (existing
    edges followed by its arrivals) is assembled vectorially and written
    with ONE row-granular scatter.  Targets whose degree would exceed
    ``max_deg`` are re-pruned over (pre-existing edges ∪ new arrivals)
    exactly like PruneOverflow (GraphConnector.cs:209-211,222-262) before
    the write.

    Row granularity is a hard requirement, not a style choice: XLA-TPU
    lowers *element* scatters into an O(C) full-table pass (measured 44 ms
    per 16k updates on an 8.4M x 32 table — the round-1 build collapsed to
    1.4k inserts/s at that scale), while row scatters stay ~6 ms flat in C.

    Operates on one layer's (C, K_l) table slice (layer 0 is (C, 2M),
    upper layers (C, M) — graph.nbr_slice); returns the updated
    (nbr_l, deg_l)."""
    W, Ms = sel.shape
    P = W * Ms
    C = nbr_l.shape[0]
    K = nbr_l.shape[1]

    u = jnp.repeat(src_ids.astype(jnp.int32), Ms)
    v = sel.reshape(P)
    pv = (v >= 0) & jnp.repeat(mask, Ms)
    # Drop arrivals already present in the target's row: when two wave
    # members select each other, the forward-row writes (which happen
    # before this scatter) already stored both directions, and appending
    # the back-edge again would duplicate it (reference rows are sets —
    # EdgeList.Add is guarded by the selection logic, Node.cs:66-76).
    already = jnp.any(nbr_l[jnp.clip(v, 0, C - 1)] == u[:, None], axis=1)
    pv = pv & ~already
    # Sort pairs by (target, distance): a distance-ascending pre-sort
    # followed by a stable group-by-target argsort leaves each target's
    # arrivals nearest-first, so the bounded overflow window below keeps
    # the *best* A arrivals (and column-K truncation drops the farthest)
    # instead of arbitrary lane order — at small corpora a hub can receive
    # tens of same-wave arrivals and lane order loses good edges.
    ucl = jnp.clip(u, 0, C - 1)
    vcl = jnp.clip(v, 0, C - 1)
    du = dst.gathered(cfg.metric, vlo[ucl], norms[ucl],
                      vlo[vcl][:, None, :], norms[vcl][:, None])[:, 0]
    key = jnp.where(pv, v, C)                     # invalid -> sort to tail
    o1 = jnp.argsort(jnp.where(pv, du, _INF))
    order = o1[jnp.argsort(key[o1], stable=True)]
    sv = key[order]
    su = u[order]
    spv = pv[order]
    ar = jnp.arange(P)
    isstart = jnp.concatenate(
        [jnp.ones((1,), bool), sv[1:] != sv[:-1]])
    svc = jnp.clip(sv, 0, C - 1)

    # Group sizes without any C-sized counter array: the next start's
    # position bounds each group (arrivals of one target are contiguous
    # after the sort).
    sp = jnp.where(isstart, ar, P)
    nxt = jnp.concatenate(
        [lax.cummin(sp[::-1])[::-1][1:], jnp.full((1,), P, sp.dtype)])
    gcnt = jnp.where(isstart, nxt - ar, 0)         # valid at starts only

    olddeg = jnp.where(spv, deg_l[svc], 0)
    total = olddeg + gcnt
    start_ok = spv & isstart
    # Overflow fires on the STORAGE width, not the degree cap: with
    # layer-0 slack columns (cfg.slack0) a full row absorbs arrivals into
    # the spare lanes and the re-prune — the dominant steady-state wave
    # cost — runs ~slack0+1x less often per row.  The re-prune target is
    # still ``max_deg``, so pruned rows return to the reference cap and
    # the slack refills.  K == max_deg wherever slack is 0 (upper layers
    # always), which is exactly the reference trigger
    # (GraphConnector.cs:209-211).
    over_row = start_ok & (total > K)

    # Existing edges of each target (slots >= deg are -1 by invariant; the
    # explicit mask keeps that true even for rows mid-repair).
    ex = nbr_l[svc]                                # (P, K)
    ex = jnp.where(jnp.arange(K)[None, :] < olddeg[:, None], ex, -1)

    # Assemble each start's appended row: columns [0, olddeg) keep the
    # existing edges, [olddeg, olddeg+gcnt) take the group's arrivals
    # (su[p], su[p+1], ...), the rest stay -1.  Arrivals past column K
    # drop here and the overflow re-prune below reconsiders them.
    colk = jnp.arange(K)[None, :]
    src = ar[:, None] + (colk - olddeg[:, None])   # arrival index per col
    arrv = su[jnp.clip(src, 0, P - 1)]
    is_arr = (colk >= olddeg[:, None]) & \
        (colk < jnp.minimum(total, K)[:, None])
    newrow = jnp.where(colk < olddeg[:, None], ex,
                       jnp.where(is_arr, arrv, -1))

    # Batched overflow re-prune: candidates = existing ∪ first A arrivals.
    # Arrivals per target are ~1-2 in practice (the pair list spreads over
    # ~P distinct targets); the window is capped so the prune width — and
    # with it the row-count-bound candidate-vector gather — stays small.
    # Arrivals beyond the window drop exactly like arrivals beyond K.
    A = min(8, Ms)
    win = jnp.minimum(ar[:, None] + jnp.arange(A)[None, :], P - 1)
    wu = su[win]                                   # (P, A)
    w_ok = (jnp.arange(A)[None, :] < jnp.minimum(gcnt, A)[:, None]) \
        & over_row[:, None]
    cand = jnp.concatenate([ex, jnp.where(w_ok, wu, -1)], axis=1)  # (P, K+A)
    budget = _reverse_budget(cfg, P)
    sel2, cnt2 = _prune_rows_compact(cfg, vlo, norms, sv, cand, over_row,
                                     max_deg, budget)
    sel2pad = jnp.full((P, K), -1, jnp.int32).at[:, :max_deg].set(sel2)

    final_row = jnp.where(over_row[:, None], sel2pad, newrow)
    final_cnt = jnp.where(over_row, cnt2, jnp.minimum(total, K))
    rowd = jnp.where(start_ok, sv, C)
    nbr_l = nbr_l.at[rowd].set(final_row, mode="drop")
    deg_l = deg_l.at[rowd].set(final_cnt, mode="drop")
    return nbr_l, deg_l


@partial(jax.jit, static_argnames=("cfg", "max_deg"),
         donate_argnames=("nbr0", "deg0"))
def _normalize_chunk(cfg: GraphConfig, vlo, norms, nbr0, deg0, rows,
                     max_deg: int):
    C, K = nbr0.shape
    ok = rows >= 0
    rc = jnp.clip(rows, 0, C - 1)
    cand = jnp.where(ok[:, None], nbr0[rc], -1)
    sel, cnt = _prune_rows(cfg, vlo, norms, rows, cand, ok, max_deg)
    selpad = jnp.full((rows.shape[0], K), -1, jnp.int32).at[
        :, :max_deg].set(sel)
    rowd = jnp.where(ok, rows, C)
    return (nbr0.at[rowd].set(selpad, mode="drop"),
            deg0.at[rowd].set(cnt, mode="drop"))


def normalize_base_rows(cfg: GraphConfig, vlo, norms, nbr0, deg0, rows_np):
    """Re-prune ``rows_np`` of the layer-0 table back to the 2M degree
    cap (heuristic semantics, PruneOverflow's orientation).

    With layer-0 slack columns (cfg.slack0) rows transiently hold up to
    2M+slack0 edges; exports in reference wire formats
    (index.to_reference_snapshot) must emit rows at the reference's cap,
    so they run their mirror through this pass first.  ``nbr0``/``deg0``
    are DONATED — callers normalizing a live state must pass copies.
    Returns the updated (nbr0, deg0) device arrays."""
    import numpy as np

    B = 4096
    i = 0
    max_deg = cfg.max_degree(True)
    while i < rows_np.size:
        take = rows_np[i:i + B]
        pad = np.full(B, -1, np.int32)
        pad[:take.size] = take
        nbr0, deg0 = _normalize_chunk(cfg, vlo, norms, nbr0, deg0,
                                      jnp.asarray(pad), max_deg)
        i += take.size
    return nbr0, deg0


def _apply_connections(cfg: GraphConfig, state: GraphState, layer, ids,
                       cd, ci, conn, max_deg: int):
    """Candidate-agnostic half of ConnectAtLayer: heuristic prune,
    forward-edge row write, back edges + overflow prune
    (GraphConnector.cs:190-214).  Returns the layer's updated
    (nbr_l, deg_l) slice plus sel."""
    from .graph import nbr_slice

    W = ids.shape[0]
    C = state.capacity
    nbr_l, deg_l = nbr_slice(state, int(layer))
    K = nbr_l.shape[1]
    cic = jnp.clip(ci, 0, C - 1)
    cvecs = state.vlo[cic]
    cnorms = state.norms[cic]
    sel, cnt = heuristic.prune(cfg.metric, jnp.where(conn[:, None], ci, -1),
                               cd, cvecs, cnorms, max_deg)

    selpad = jnp.full((W, K), -1, jnp.int32).at[:, :max_deg].set(sel)
    rowsafe = jnp.where(conn, ids, C)
    nbr_l = nbr_l.at[rowsafe].set(selpad, mode="drop")
    deg_l = deg_l.at[rowsafe].set(cnt, mode="drop")
    nbr_l, deg_l = _add_reverse(cfg, state.vlo, state.norms, nbr_l, deg_l,
                                ids, sel, conn, max_deg)
    return nbr_l, deg_l, sel


def _connect_at_layer(cfg: GraphConfig, state: GraphState, layer, ids, vecs,
                      qn, entry, conn, max_deg: int):
    """One layer of the insert path (ConnectAtLayer,
    GraphConnector.cs:187-217): beam search + _apply_connections.
    Returns the layer's updated (nbr_l, deg_l) slice and the chained
    entry."""
    efc = cfg.ef_construction
    p = cfg.build_expand
    max_iters = (cfg.search_iter_factor * efc) // p + 16

    cd, ci = beam_search(cfg, state, vecs, qn, entry, conn, layer, efc,
                         max_iters, expand=p)
    nbr_l, deg_l, sel = _apply_connections(cfg, state, layer, ids, cd, ci,
                                           conn, max_deg)
    # Chain the closest accepted neighbor as the next layer's entry point
    # (GraphConnector.cs:216 returns bestNeighborsIds[0]).
    nxt = sel[:, 0]
    entry = jnp.where(conn & (nxt >= 0), nxt, entry)
    return nbr_l, deg_l, entry


@partial(jax.jit, static_argnames=("bucket", "max_wave", "max_up"))
def wave_head(count, dids, dvecs, dlvls, cur, n_total, bucket: int,
              max_wave: int, max_up: int = 1 << 30):
    """Compute the next insert wave's lanes ENTIRELY on device.

    ``dids/dvecs/dlvls`` are the whole add() batch, uploaded once;
    ``cur`` is a device cursor and ``n_total`` a device scalar of the
    batch's true length.  The wave width replicates the host scheduler's
    formula (w = min(max_wave, max(1, built), remaining), further bounded
    so at most ``max_up`` level>=1 members land in one wave — the upper
    connect's lane ladder is static and silently truncating overflow
    members would cost them their upper edges; the host picks the static
    ``bucket`` from its exact mirror of the same quantities), so zero
    per-wave host->device uploads are needed — through a tunneled backend
    each upload costs 30-130 ms of latency, which was the dominant
    per-wave cost (a 512-wave's 4 uploads capped builds at ~5.5k
    inserts/s at ANY corpus size).

    Returns (wid, wvec, wlvl, valid, cur') shaped to ``bucket``."""
    D = dvecs.shape[1]
    n = dids.shape[0]
    remaining = n_total - cur
    w = jnp.minimum(jnp.minimum(max_wave, jnp.maximum(1, count)),
                    remaining)
    w = jnp.minimum(w, bucket)
    lane = jnp.arange(bucket, dtype=jnp.int32)
    safe = jnp.clip(cur + lane, 0, n - 1)
    valid = lane < w
    if max_up < bucket:
        # prefix cap on level>=1 members: cumsum is nondecreasing, so the
        # cap keeps the wave a contiguous prefix of the batch
        upcum = jnp.cumsum((dlvls[safe] >= 1).astype(jnp.int32))
        valid = valid & (upcum <= max_up)
        w = jnp.sum(valid, dtype=jnp.int32)
    wid = jnp.where(valid, dids[safe], -1)
    wlvl = jnp.where(valid, dlvls[safe], 0)
    wvec = jnp.where(valid[:, None], dvecs[safe], 0.0).astype(jnp.float32)
    return wid, wvec, wlvl, valid, cur + w


@partial(jax.jit, static_argnames=("ubucket",))
def upper_compact(wid, wlvl, valid, ubucket: int):
    """Compact a wave's level>=1 members into a small lane bucket on
    device (the host used np.flatnonzero + an upload per wave; the host
    still knows the exact upper count and picks the static bucket).
    Returns (uid, ulvl, uval, lanes) — ``lanes`` maps upper lanes back to
    wave lanes (-1 pad) for the beam path's entry chaining."""
    isup = valid & (wlvl >= 1)
    order = jnp.argsort(~isup, stable=True)[:ubucket].astype(jnp.int32)
    uval = isup[order]
    uid = jnp.where(uval, wid[order], -1)
    ulvl = jnp.where(uval, wlvl[order], 0)
    lanes = jnp.where(uval, order, -1)
    return uid, ulvl, uval, lanes


@partial(jax.jit, static_argnames=("cfg", "bucket", "ubucket", "max_wave",
                                   "nscan", "max_up", "k_waves",
                                   "max_lvl", "scan2"),
         donate_argnames=("state",))
def insert_wave_fused(cfg: GraphConfig, state: GraphState, dids, dvecs,
                      dlvls, cur, n_total, panel_ids, bucket: int,
                      ubucket: int, max_wave: int, nscan: int | None,
                      max_up: int = 1 << 30, k_waves: int = 1,
                      max_lvl: int = 0, scan2: bool = False):
    """One-launch exact-path wave insert: wave_head + scatter_wave +
    upper_connect_exact + base_connect_exact composed into a single
    device program.

    Per-program-launch host latency through the tunneled backend runs
    ~15-20 ms for programs carrying the full GraphState pytree (a bare
    trivial-jit launch is ~0.7 ms), so the 4-launch wave paid ~60-80 ms
    of pure launch cost on a 1-core host — the dominant per-wave cost
    once per-wave uploads were eliminated.  ``ubucket == 0`` skips the
    upper phase (the host knows each wave's upper count exactly).

    ``k_waves`` chains that many CONSECUTIVE waves in one launch
    (Python-unrolled — a lax carry of the neighbor tables would make XLA
    materialize lane-padded copies per step), amortizing the remaining
    per-launch latency.  Correct without host help because every wave
    quantity is device-derived: base_connect_exact advances state.count,
    wave_head re-reads it plus the carried cursor, and waves 2..K scan a
    prefix that already contains wave 1's (active) rows — identical
    programs to K separate launches.  The host only groups waves whose
    widths/upper counts it has simulated to fit the static buckets.

    ``max_lvl`` (static) bounds the upper phase's layer loop to the
    wave's (group-max) top level — see upper_connect_exact; 0 runs all
    layers.  The host passes a bucketed upper bound, never a smaller
    value than the true wave top.
    Returns (state, cur')."""
    for _ in range(k_waves):
        wid, wvec, wlvl, valid, cur = wave_head(state.count, dids, dvecs,
                                                dlvls, cur, n_total, bucket,
                                                max_wave, max_up)
        state = scatter_wave(cfg, state, wid, wvec, wlvl, valid)
        if ubucket:
            uid, ulvl, uval, _ = upper_compact(wid, wlvl, valid, ubucket)
            state = upper_connect_exact(cfg, state, uid, ulvl, uval,
                                        panel_ids, max_lvl)
        state = base_connect_exact(cfg, state, wid, wlvl, valid,
                                   nscan=nscan, scan2=scan2)
    return state, cur


@partial(jax.jit, static_argnames=("cfg", "bucket", "ubucket", "max_wave",
                                   "max_up"),
         donate_argnames=("state",))
def insert_wave_beam_fused(cfg: GraphConfig, state: GraphState, dids,
                           dvecs, dlvls, cur, n_total, bucket: int,
                           ubucket: int, max_wave: int,
                           max_up: int = 1 << 30):
    """One-launch *beam-path* wave insert: wave_head + scatter_wave +
    upper_compact + upper_connect + base_connect composed into a single
    device program — the upload-free twin of ``insert_wave_fused`` for
    custom metrics and corpora past the exact-build threshold.  The
    sharded index drains every shard's wave through this program inside
    one shard_map launch (per-wave host->device uploads cost 30-130 ms
    through a tunneled backend; see wave_head).  ``ubucket == 0`` skips
    the upper phase (the host mirrors each wave's upper count exactly).
    Returns (state, cur')."""
    wid, wvec, wlvl, valid, cur = wave_head(state.count, dids, dvecs,
                                            dlvls, cur, n_total, bucket,
                                            max_wave, max_up)
    state = scatter_wave(cfg, state, wid, wvec, wlvl, valid)
    up_lanes = jnp.full((1,), -1, jnp.int32)
    ue = jnp.full((1,), -1, jnp.int32)
    if ubucket:
        uid, ulvl, uval, lanes = upper_compact(wid, wlvl, valid, ubucket)
        state, ue = upper_connect(cfg, state, uid, ulvl, uval)
        up_lanes = lanes
    state = base_connect(cfg, state, wid, wlvl, valid, up_lanes, ue)
    return state, cur


@partial(jax.jit, static_argnames=("cfg",), donate_argnames=("state",))
def scatter_wave(cfg: GraphConfig, state: GraphState, ids, vecs, lvls,
                 valid):
    """Phase 1: store a wave's vectors/levels/active bits
    (GraphData.AddItem's storage half, GraphData.cs:79-117)."""
    C = state.capacity
    ids = ids.astype(jnp.int32)
    vn = dst.norm_data(cfg.metric, vecs)
    rowsafe = jnp.where(valid, ids, C)
    return state._replace(
        vectors=state.vectors.at[rowsafe].set(vecs, mode="drop"),
        vlo_store=update_vlo(state, rowsafe, vecs),
        coarse=update_coarse(state, rowsafe, vecs),
        norms=state.norms.at[rowsafe].set(vn, mode="drop"),
        level=state.level.at[rowsafe].set(lvls.astype(jnp.int32),
                                          mode="drop"),
        active=state.active.at[rowsafe].set(True, mode="drop"),
    )


@partial(jax.jit, static_argnames=("cfg",), donate_argnames=("state",))
def upper_connect(cfg: GraphConfig, state: GraphState, ids, lvls, valid):
    """Phase 2: connect wave members with level >= 1 at layers L-1..1.

    Runs at a narrow lane width: only ~1/M of inserts live above layer 0
    (exponential level law, GraphData.cs:211-219), but a full-width
    layer loop would pay whole-wave beam gathers at every layer.  The host
    compacts the upper items into a small bucket before calling.

    Returns (state, entry0, has_entry): the chained entry point each upper
    item should start its layer-0 search from (AddNewConnections' descent,
    GraphConnector.cs:172-181)."""
    Wu = ids.shape[0]
    C = state.capacity
    L = state.num_levels
    ids = ids.astype(jnp.int32)
    lvls = lvls.astype(jnp.int32)
    vecs = state.vectors[jnp.clip(ids, 0, C - 1)]
    vn = state.norms[jnp.clip(ids, 0, C - 1)]

    ep0 = state.ep
    has_graph = ep0 >= 0
    old_top = jnp.where(has_graph, state.level[jnp.clip(ep0, 0, C - 1)], -1)
    conn_top = jnp.minimum(lvls, old_top)

    ep_b = jnp.broadcast_to(jnp.where(has_graph, ep0, -1), (Wu,))
    entry, _ = greedy_descent(cfg, state, vecs, vn, ep_b,
                              jnp.broadcast_to(old_top, (Wu,)), conn_top)

    # The layer loop is Python-unrolled (L is static): carrying the
    # neighbor tables through a lax.fori_loop makes XLA materialize a
    # lane-padded copy per step (s32[..., K] pads K -> 128, a 4x blowup
    # that OOMs at 8M rows); with static layer indices every scatter
    # updates the donated tables in place.
    from .graph import with_nbr_slice

    for layer in range(L - 1, 0, -1):
        conn = valid & has_graph & (layer <= conn_top) & (lvls >= layer)
        nbr_l, deg_l, entry = _connect_at_layer(cfg, state, layer, ids,
                                                vecs, vn, entry, conn,
                                                cfg.max_edges)
        state = with_nbr_slice(state, layer, nbr_l, deg_l)
    return state, entry


@partial(jax.jit, static_argnames=("cfg", "max_lvl"),
         donate_argnames=("state",))
def upper_connect_exact(cfg: GraphConfig, state: GraphState, ids, lvls,
                        valid, panel_ids, max_lvl: int = 0):
    """Phase 2 (exact variant): connect upper-level wave members from exact
    MXU candidates over the compacted upper-node panel.

    Upper layers hold only ~M^-l of the corpus (exponential level law,
    GraphData.cs:211-219), so the host maintains ``panel_ids (Cu,) i32`` —
    the ids of every live node with level >= 1, -1 in unused slots.  One
    (Wu, Cu) distance panel against those rows replaces the per-layer
    greedy-descent + beam machinery entirely: the beams' row gathers
    against the full-capacity neighbor tables were the dominant wave cost
    at 8M rows (~150 ms vs ~5 ms for this scan), and exact candidates
    strictly dominate beam candidates in quality.

    Per layer l the candidate set is masked to panel rows with
    level >= l (preserving the invariant that layer-l edges point to
    layer-l nodes) and pruned/written exactly like the beam variant
    (ConnectAtLayer, GraphConnector.cs:187-217).  Distances rank on the
    bf16 coarse mirror when present, then the surviving ef_construction
    candidates are rescored in f32 before the heuristic (same two-stage
    scheme as ops/bruteforce.exact_knn2).

    ``max_lvl`` (static) bounds the layer loop to the wave's actual top
    level: layers above every member's level are exact no-ops (``conn``
    is all-false, the row scatter drops everything), yet each one costs
    a full approx_min_k + prune + reverse-scatter chain of small-op
    latency per wave.  The host knows the wave's levels exactly and
    passes a bucketed bound; 0 means 'all layers' (the safe default —
    passing a bound SMALLER than the wave's true top level would
    silently strip upper edges)."""
    from .graph import with_nbr_slice

    Wu = ids.shape[0]
    C = state.capacity
    L = state.num_levels
    top = L - 1 if max_lvl <= 0 else min(L - 1, max_lvl)
    Cu = panel_ids.shape[0]
    ids = ids.astype(jnp.int32)
    lvls = lvls.astype(jnp.int32)

    ep0 = state.ep
    has_graph = ep0 >= 0
    old_top = jnp.where(has_graph, state.level[jnp.clip(ep0, 0, C - 1)], -1)
    conn_top = jnp.minimum(lvls, old_top)

    pc = jnp.clip(panel_ids, 0, C - 1)
    pok = (panel_ids >= 0) & state.active[pc]
    plvl = jnp.where(pok, state.level[pc], -1)

    store = state.coarse_table
    store = state.vlo if store is None else store
    lo = store.dtype == jnp.bfloat16
    qc = jnp.clip(ids, 0, C - 1)
    qv = store[qc]
    qn = state.norms[qc]
    pv = store[pc]
    pn = state.norms[pc]
    dots = jnp.einsum("wd,cd->wc", qv, pv,
                      precision=None if lo else dst.DOT_PRECISION,
                      preferred_element_type=jnp.float32)
    dall = dst.from_dot(cfg.metric, dots, qn[:, None], pn[None, :])
    # self-exclusion (the wave's own members are already in the panel)
    dall = jnp.where(panel_ids[None, :] == ids[:, None], _INF, dall)

    qvf = state.vlo[qc]
    NC = min(cfg.ef_construction, Cu)
    for layer in range(top, 0, -1):
        conn = valid & has_graph & (layer <= conn_top) & (lvls >= layer)
        d_l = jnp.where((pok & (plvl >= layer))[None, :], dall, _INF)
        vals, idx = lax.approx_min_k(d_l, NC, recall_target=0.95)
        ci = jnp.where(jnp.isfinite(vals), panel_ids[idx], -1)
        # f32 rescore of the survivors (bf16 coarse noise must not reach
        # the heuristic's accept test)
        cic = jnp.clip(ci, 0, C - 1)
        cd = dst.gathered(cfg.metric, qvf, qn, state.vlo[cic],
                          state.norms[cic])
        cd = jnp.where(ci >= 0, cd, _INF)
        nbr_l, deg_l, _ = _apply_connections(cfg, state, layer, ids, cd, ci,
                                             conn, cfg.max_edges)
        state = with_nbr_slice(state, layer, nbr_l, deg_l)
    return state


@partial(jax.jit, static_argnames=("cfg",), donate_argnames=("state",))
def base_connect(cfg: GraphConfig, state: GraphState, ids, lvls, valid,
                 up_lanes, up_entry):
    """Phase 3: layer-0 connections for the whole wave + entry-point
    promotion + count update.

    ``up_lanes (Wu,)`` / ``up_entry (Wu,)`` carry the chained entries of
    upper items from phase 2 (device-side, no host round-trip); everyone
    else greedy-descends from the global entry point (FindEntryPoint,
    GraphNavigator.cs:27)."""
    W = ids.shape[0]
    C = state.capacity
    ids = ids.astype(jnp.int32)
    lvls = lvls.astype(jnp.int32)
    entry_hint = jnp.full((W,), -1, jnp.int32).at[
        jnp.where(up_lanes >= 0, up_lanes, W)].set(
            up_entry.astype(jnp.int32), mode="drop")
    hint_ok = entry_hint >= 0
    vecs = state.vectors[jnp.clip(ids, 0, C - 1)]
    vn = state.norms[jnp.clip(ids, 0, C - 1)]

    ep0 = state.ep
    has_graph = ep0 >= 0
    old_top = jnp.where(has_graph, state.level[jnp.clip(ep0, 0, C - 1)], -1)

    ep_b = jnp.broadcast_to(jnp.where(has_graph, ep0, -1), (W,))
    start = jnp.where(hint_ok, entry_hint, ep_b)
    start_layer = jnp.where(hint_ok, 0, jnp.broadcast_to(old_top, (W,)))
    entry, _ = greedy_descent(cfg, state, vecs, vn, start, start_layer,
                              jnp.zeros((W,), jnp.int32))
    # The descent runs after this wave's upper-layer edges were written, so
    # it can land on a *wave member* — which has no layer-0 edges yet and
    # would dead-end the beam.  Any zero-out-degree entry falls back to the
    # pre-wave global entry point.
    entry_ok = state.deg0[jnp.clip(entry, 0, C - 1)] > 0
    entry = jnp.where(entry_ok, entry, ep_b)

    conn0 = valid & has_graph
    nbr0, deg0, _ = _connect_at_layer(cfg, state, 0, ids, vecs, vn, entry,
                                      conn0, 2 * cfg.max_edges)

    lv_eff = jnp.where(valid, lvls, -2)
    best_i = jnp.argmax(lv_eff)
    best_lvl = lv_eff[best_i]
    new_ep = jnp.where(best_lvl > old_top, ids[best_i], ep0).astype(jnp.int32)
    return state._replace(
        nbr0=nbr0, deg0=deg0, ep=new_ep,
        count=state.count + jnp.sum(valid, dtype=jnp.int32))


@partial(jax.jit, static_argnames=("cfg", "nscan", "scan2"),
         donate_argnames=("state",))
def base_connect_exact(cfg: GraphConfig, state: GraphState, ids, lvls,
                       valid, nscan: int | None = None,
                       scan2: bool = False):
    """Phase 3 (exact variant): layer-0 connections from *exact* MXU
    brute-force candidates instead of beam search.

    One blocked matmul of the wave against the whole corpus replaces
    hundreds of bandwidth-bound neighbor gathers; candidates are the true
    efConstruction nearest neighbors, so graph quality dominates the beam
    path.  Used while the corpus is below the host's exact-build threshold
    (construction cost is O(C) per wave).  Once the scan prefix reaches
    2M rows the scan always switches to the two-stage form (bf16 coarse +
    f32 rescore of 4x-oversampled survivors, ops/bruteforce.exact_knn2) —
    the coarse matmul runs at the MXU's native rate; from BUILD_SCAN2_MIN
    prefix rows up, full-width steady waves (``scan2``) take it too."""
    from ..ops.bruteforce import exact_knn, exact_knn2

    W = ids.shape[0]
    C = state.capacity
    ids = ids.astype(jnp.int32)
    lvls = lvls.astype(jnp.int32)
    vecs = state.vectors[jnp.clip(ids, 0, C - 1)]

    ep0 = state.ep
    has_graph = ep0 >= 0
    old_top = jnp.where(has_graph, state.level[jnp.clip(ep0, 0, C - 1)], -1)

    # Scan only the slot prefix actually built so far (``nscan`` is the
    # host's bucketed high-water mark): with capacity preallocated at the
    # final corpus size, a full-width scan pays the 8M-row cost from the
    # very first wave.  Prefix slicing keeps survivor positions == global
    # ids; the f32 rescore inside exact_knn2 gathers from the full store.
    ns = C if nscan is None else min(nscan, C)
    ct = state.coarse_table
    # Two-stage scan gating: always once the scan prefix reaches 2M rows
    # (the blocked f32-panel form would OOM/crawl); below that only when
    # the host asks (``scan2`` — set for full-width steady waves, taken
    # from BUILD_SCAN2_MIN prefix rows up).  The host limits scan2 to
    # the steady bucket because every (bucket, ubucket) program variant
    # embedding the fused Pallas scan pays a much slower XLA compile —
    # letting the early bucket ladder embed it turned a 1M build's seed
    # phase into ~10 slow compiles (>900 s total through the relay) for
    # rows that account for <1% of the build.  ``ns`` is static (host-
    # bucketed), so this is a compile-time branch.
    if ct is not None and (ns >= (1 << 21)
                           or (scan2 and ns >= BUILD_SCAN2_MIN)):
        cd, ci = exact_knn2(cfg.metric, state.vectors, ct[:ns],
                            state.norms[:ns], state.active[:ns], vecs,
                            cfg.ef_construction, exclude=ids)
    else:
        cd, ci = exact_knn(cfg.metric, state.vlo[:ns], state.norms[:ns],
                           state.active[:ns], vecs, cfg.ef_construction,
                           exclude=ids)
    conn0 = valid & has_graph
    nbr0, deg0, _ = _apply_connections(cfg, state, 0, ids, cd, ci, conn0,
                                       2 * cfg.max_edges)

    lv_eff = jnp.where(valid, lvls, -2)
    best_i = jnp.argmax(lv_eff)
    best_lvl = lv_eff[best_i]
    new_ep = jnp.where(best_lvl > old_top, ids[best_i], ep0).astype(jnp.int32)
    return state._replace(
        nbr0=nbr0, deg0=deg0, ep=new_ep,
        count=state.count + jnp.sum(valid, dtype=jnp.int32))


@partial(jax.jit, static_argnames=("cfg",), donate_argnames=("state",))
def insert_wave(cfg: GraphConfig, state: GraphState, ids, vecs, lvls, valid):
    """Insert a wave of items (see module docstring).

    ``ids (W,)`` pre-assigned slots, ``vecs (W, D)``, ``lvls (W,)`` sampled
    levels, ``valid (W,)`` lane mask (waves are padded to bucket sizes so
    one compilation serves many wave sizes).  Returns the new GraphState.
    """
    W = ids.shape[0]
    C = state.capacity
    L = state.num_levels
    ids = ids.astype(jnp.int32)
    lvls = lvls.astype(jnp.int32)

    vn = dst.norm_data(cfg.metric, vecs)
    rowsafe = jnp.where(valid, ids, C)
    state = state._replace(
        vectors=state.vectors.at[rowsafe].set(vecs, mode="drop"),
        vlo_store=update_vlo(state, rowsafe, vecs),
        coarse=update_coarse(state, rowsafe, vecs),
        norms=state.norms.at[rowsafe].set(vn, mode="drop"),
        level=state.level.at[rowsafe].set(lvls, mode="drop"),
        active=state.active.at[rowsafe].set(True, mode="drop"),
    )

    ep0 = state.ep
    has_graph = ep0 >= 0
    old_top = jnp.where(has_graph, state.level[jnp.clip(ep0, 0, C - 1)], -1)
    conn_top = jnp.minimum(lvls, old_top)    # GraphConnector.cs:176

    ep_b = jnp.broadcast_to(jnp.where(has_graph, ep0, -1), (W,))
    entry, _ = greedy_descent(cfg, state, vecs, vn, ep_b,
                              jnp.broadcast_to(old_top, (W,)), conn_top)

    # Upper layers L-1 .. 1 (degree cap M), then layer 0 (cap 2*M) —
    # GraphData.cs:247-250.  Python-unrolled: see upper_connect.
    from .graph import with_nbr_slice

    for layer in range(L - 1, 0, -1):
        conn = valid & has_graph & (layer <= conn_top)
        nbr_l, deg_l, entry = _connect_at_layer(cfg, state, layer, ids,
                                                vecs, vn, entry, conn,
                                                cfg.max_edges)
        state = with_nbr_slice(state, layer, nbr_l, deg_l)

    conn0 = valid & has_graph
    nbr0, deg0, _ = _connect_at_layer(cfg, state, 0, ids, vecs, vn, entry,
                                      conn0, 2 * cfg.max_edges)

    # Entry-point promotion (GraphConnector.cs:36-41): highest-level wave
    # member wins if it exceeds the old top; first such member on ties.
    lv_eff = jnp.where(valid, lvls, -2)
    best_i = jnp.argmax(lv_eff)
    best_lvl = lv_eff[best_i]
    new_ep = jnp.where(best_lvl > old_top, ids[best_i], ep0).astype(jnp.int32)

    return state._replace(
        nbr0=nbr0, deg0=deg0, ep=new_ep,
        count=state.count + jnp.sum(valid, dtype=jnp.int32))
