"""Multi-chip scaling: corpus sharded over a device mesh.

The reference has no distributed layer at all (SURVEY.md §2: its only
parallelism is shared-memory threading).  The TPU-native scaling design —
per BASELINE.json's north star — is:

* the corpus and its graph are *sharded by row* across a
  ``jax.sharding.Mesh`` axis ("shard"); each device owns an independent
  HNSW subgraph over its rows (no cross-shard edges, so construction needs
  zero communication);
* inserts are round-robin assigned to shards and applied as per-shard
  waves inside one ``shard_map`` program — the SPMD analog of the
  reference's ``Parallel.For`` insert loop (HNSWIndex.cs:70-78);
* queries are replicated to every shard, each shard runs its local beam
  search, and the per-shard top-k lists are merged into a global top-k —
  one all-gather over ICI per query batch (the ``shard_map`` program
  returns per-shard results; the merge jit reduces across the sharded
  axis, letting XLA place the collective).

Global ids interleave: ``gid = local_slot * n_shards + shard``.  With
round-robin insertion this keeps ids dense from 0 (like the reference's),
and — decisively — the mapping never depends on capacity, so per-shard
capacity growth (the mesh analog of the reference's array doubling,
GraphData.cs:95-115) preserves every previously returned id.

Capability parity with the single-chip facade: add / remove (with slot
recycling) / update, knn (graph + exact) with filters and a layer
argument, range queries, multi-layer queries, per-layer degree stats,
connected components, count/ids/items, serialize/deserialize.  Compiled
SPMD programs are cached per static shape on the instance.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:
    from jax import shard_map  # jax >= 0.7 promoted API
    def _shard_map(f, mesh, in_specs, out_specs):
        return shard_map(f, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs, check_vma=False)
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _esm
    def _shard_map(f, mesh, in_specs, out_specs):
        return _esm(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                    check_rep=False)

from ..core import graph as G
from ..core import stats
from ..core.construct import insert_wave_beam_fused, insert_wave_fused
from ..core.search import beam_search, greedy_descent, knn_search, \
    range_search
from ..index import MIRROR_MAX_BYTES, SCAN_FLOOR, UPPER_BUCKETS, \
    WAVE_BUCKETS, _bucket, _lvl_bucket, _next_pow2
from ..ops import distance as dst
from ..params import HNSWParameters
from ..utils.refine import refine_pairs

RANGE_POOLS = (64, 512, 4096)
#: floor of the per-shard upper-panel width ladder (bounds recompiles)
_SPANEL_MIN = 1024


def _squeeze(tree):
    return jax.tree.map(lambda x: x[0], tree)


def _expand(tree):
    return jax.tree.map(lambda x: x[None, ...], tree)


class ShardedIndex:
    """Corpus sharded across ``n_shards`` devices (see module docstring)."""

    def __init__(self, dim: int, metric: str = "sq_euclid",
                 parameters: HNSWParameters | None = None,
                 devices: List[jax.Device] | None = None):
        dst.check_metric(metric)
        self.dim = int(dim)
        self.metric = metric
        self.params = parameters or HNSWParameters()
        devices = devices or jax.devices()
        self.n_shards = len(devices)
        self.mesh = Mesh(np.asarray(devices), axis_names=("shard",))

        p = self.params
        from ..index import _alloc_capacity
        local_cap = _alloc_capacity(
            max(2, -(-p.collection_size // self.n_shards)))
        self.shard_capacity = local_cap
        max_levels = G.default_max_levels(local_cap, p.distribution_rate)
        from ..index import resolve_rank_dtype
        self._cfg = G.GraphConfig(
            dim=self.dim, metric=metric, max_edges=p.max_edges,
            max_levels=max_levels, ef_construction=p.max_candidates,
            search_iter_factor=p.search_iter_factor,
            build_expand=p.build_expand,
            rank_dtype=resolve_rank_dtype(p.rank_dtype),
            # clamped like the single-chip index (reference parameter
            # bands at degenerate M)
            slack0=min(p.reverse_slack, p.max_edges // 2))

        state0 = G.empty_state(self._cfg, local_cap)
        shspec = jax.tree.map(
            lambda x: NamedSharding(
                self.mesh, P("shard", *([None] * x.ndim))), state0)
        self._state = jax.tree.map(
            lambda x, s: jax.device_put(
                jnp.broadcast_to(x[None], (self.n_shards,) + x.shape), s),
            state0, shspec)
        seed = p.random_seed if p.random_seed >= 0 else None
        self._rng = np.random.default_rng(seed)
        self._lengths = np.zeros(self.n_shards, dtype=np.int64)
        self._counts = np.zeros(self.n_shards, dtype=np.int64)  # host mirror
        self._free: List[List[int]] = [[] for _ in range(self.n_shards)]
        self._seeded = np.zeros(self.n_shards, dtype=bool)
        self._fns = {}                  # compiled SPMD program cache
        self._host_vectors: Optional[np.ndarray] = None
        self._pack = None               # stacked per-shard QueryPack
        # per-shard live level>=1 local slots (exact-path upper panel,
        # construct.upper_connect_exact); host-owned, shipped to the mesh
        # once per drain — never per wave
        self._upper_set: List[set] = [set() for _ in range(self.n_shards)]
        self._shwm = 0                  # slot high-water mark (scan prefix)
        self._wave_trace: Optional[list] = None   # test hook: per-wave widths
        self._rm_trace: Optional[list] = None     # test hook: removal launches

    # ------------------------------------------------------------------
    # internals
    # ------------------------------------------------------------------

    def _cached(self, key, build):
        fn = self._fns.get(key)
        if fn is None:
            fn = self._fns[key] = build()
        return fn

    def _invalidate_caches(self):
        self._host_vectors = None
        self._pack = None

    def _mirrorable(self) -> bool:
        """Host-mirror budget gate (the single-chip MIRROR_MAX_BYTES
        contract, VERDICT r3 #3): above it refinement and row fetches run
        on device and only (B, k)-sized results cross the link — at the
        100M north star the full mirror is a ~50 GB transfer through a
        10-18 MB/s relay."""
        return (self.n_shards * self.shard_capacity * self.dim * 4
                <= MIRROR_MAX_BYTES)

    def _host_vecs(self) -> np.ndarray:
        """(S, C, D) host mirror of stored vectors for f64 refinement.
        Only valid under the mirror budget — callers must gate on
        _mirrorable() (or go through _rows_global)."""
        if self._host_vectors is None:
            self._host_vectors = np.asarray(self._state.vectors)
        return self._host_vectors

    def _rows_fn(self, B: int):
        """(B,) global ids -> (B, D) stored vectors, gathered on the mesh:
        each shard contributes its owned lanes, psum merges (every lane is
        owned by at most one shard)."""
        C = self.shard_capacity

        def build():
            def run(st, gids):
                local = _squeeze(st)
                sid = lax.axis_index("shard").astype(jnp.int32)
                S = self.n_shards
                own = (gids >= 0) & ((gids % S) == sid)
                lid = jnp.clip(gids // S, 0, C - 1)
                rows = jnp.where(own[:, None], local.vectors[lid], 0.0)
                return lax.psum(rows, "shard")[None]

            specs = (self._state_specs(), P())
            return jax.jit(_shard_map(run, self.mesh, specs, P("shard")))
        return self._cached(("rows", B), build)

    def _rows_global(self, gids) -> np.ndarray:
        """(B, D) stored vectors for a (small) global-id set — host mirror
        when affordable, device gather + (B, D) transfer otherwise (the
        single-chip HNSWIndex._rows contract)."""
        g = np.asarray(gids, np.int64).ravel()
        g = np.clip(g, 0, self.n_shards * self.shard_capacity - 1)
        if self._mirrorable():
            hv = self._host_vecs()
            S = self.n_shards
            return hv[g % S, g // S]
        B = max(8, _next_pow2(g.size))
        pad = np.full(B, -1, np.int64)
        pad[:g.size] = g
        fn = self._rows_fn(B)
        out = np.asarray(fn(self._state, jnp.asarray(pad, jnp.int32)))
        return out[0, :g.size]

    def _refine_fn(self, W: int):
        """Device-side refine program: per-shard owned-lane direct-formula
        distances, cross-shard min (each lane owned by <= 1 shard), full
        argsort — only the sorted (B, W) ids/distances cross the link."""
        C = self.shard_capacity
        metric = self.metric

        def build():
            def run(st, q, gids):
                local = _squeeze(st)
                sid = lax.axis_index("shard").astype(jnp.int32)
                S = self.n_shards
                own = (gids >= 0) & ((gids % S) == sid)
                lid = jnp.clip(gids // S, 0, C - 1)
                vv = local.vectors[lid]                       # (B, W, D)
                d = dst.exact(metric, q[:, None, :],
                              vv).astype(jnp.float32)
                # each lane is owned by at most one shard: psum of the
                # owned contribution merges, unowned lanes turn to +inf
                d = lax.psum(jnp.where(own, d, 0.0), "shard") \
                    + jnp.where(lax.psum(own.astype(jnp.float32),
                                         "shard") > 0, 0.0, jnp.inf)
                return d[None]

            def refine(st, q, gids):
                d = _shard_map(run, self.mesh,
                               (self._state_specs(), P(), P()),
                               P("shard"))(st, q, gids)[0]    # (B, W)
                order = jnp.argsort(d, axis=1, stable=True)
                oi = jnp.take_along_axis(gids, order, axis=1)
                od = jnp.take_along_axis(d, order, axis=1)
                return oi.astype(jnp.int32), od

            return jax.jit(refine)
        return self._cached(("refine", W), build)

    def _local(self, s: int):
        """One shard's state slice (host-driven per-shard ops)."""
        return _squeeze(jax.tree.map(lambda x: x[s:s + 1], self._state))

    def _set_local(self, s: int, local):
        self._state = jax.tree.map(
            lambda full, one: full.at[s].set(one), self._state, local)

    def _state_specs(self):
        return jax.tree.map(lambda _: P("shard"), self._state)

    def _ep_tops(self) -> List[int]:
        """Per-shard entry-point top level via one device-side gather —
        never a full (S, C) level mirror (multi-second at scale through
        remote relays, VERDICT r3 weak #6)."""
        S = self.n_shards
        eps = self._state.ep                               # (S,)
        lvl_ep = self._state.level[jnp.arange(S),
                                   jnp.clip(eps, 0, self.shard_capacity - 1)]
        tops = np.where(np.asarray(eps) >= 0, np.asarray(lvl_ep), -1)
        return [int(t) for t in tops]

    def _grow_shards(self, new_local_cap: int) -> None:
        """Grow every shard's capacity on the mesh — the distributed form
        of the reference's array-doubling resize (GraphData.cs:95-115,
        exercised by GraphResizeTests.cs:17-64).

        One SPMD pad program (core.graph.grow_state under shard_map): the
        shard axis is untouched, so no collectives and no resharding —
        each device pads its own slice in HBM.  Interleaved gids
        (slot * S + shard) are capacity-independent, so every id ever
        returned stays valid.  Compiled-program and pack caches are
        dropped: cached closures captured the old capacity in their clip
        bounds."""
        C = self.shard_capacity
        if new_local_cap <= C:
            return

        def run(st):
            return _expand(G.grow_state(_squeeze(st), new_local_cap))

        fn = jax.jit(_shard_map(run, self.mesh, (self._state_specs(),),
                                self._state_specs()),
                     donate_argnums=(0,))
        self._state = fn(self._state)
        self.shard_capacity = new_local_cap
        self._fns = {}
        self._invalidate_caches()

    def _refine_global(self, q: np.ndarray, gids: np.ndarray, k: int
                       ) -> Tuple[np.ndarray, np.ndarray]:
        """Re-rank candidate global ids with the direct metric formula:
        float64 against the host mirror while the corpus fits the mirror
        budget, direct-f32 on the mesh beyond it (only the sorted (B, W)
        pairs cross the link — see utils/refine docstring)."""
        C = self.shard_capacity
        gids = np.asarray(gids)
        if self._mirrorable():
            hv = self._host_vecs()
            S = self.n_shards
            g = np.clip(gids, 0, S * C - 1)
            cand = hv[g % S, g // S]
            return refine_pairs(self.metric, q, gids, cand, k)
        B, W = gids.shape
        Wp = max(8, _next_pow2(W))
        pad = np.full((B, Wp), -1, np.int64)
        pad[:, :W] = gids
        fn = self._refine_fn(Wp)
        oi, od = fn(self._state, jnp.asarray(q, jnp.float32),
                    jnp.asarray(pad, jnp.int32))
        out_ids = np.asarray(oi)[:, :k]
        out_d = np.asarray(od)[:, :k].astype(np.float32)
        if out_ids.shape[1] < k:            # fewer candidates than k
            padk = k - out_ids.shape[1]
            out_ids = np.pad(out_ids, ((0, 0), (0, padk)),
                             constant_values=-1)
            out_d = np.pad(out_d, ((0, 0), (0, padk)),
                           constant_values=np.nan)
        return (out_ids.astype(np.int32),
                np.where(out_ids >= 0, out_d, np.nan))

    def _global_filter_mask(self, filter_fnc) -> Optional[jnp.ndarray]:
        """(S, C) bool mask from global ids / bool array.  Callable
        predicates never come through here — they are evaluated lazily on
        candidates only (see _knn_query_callable; an O(N) sweep of the
        corpus per query call would defeat the reference's visited-node
        filtering contract, GraphNavigator.cs:235-239)."""
        if filter_fnc is None:
            return None
        S, C = self.n_shards, self.shard_capacity
        arr = np.asarray(filter_fnc)
        if arr.dtype == bool and arr.shape != (S * C,):
            # never reinterpret a wrong-length bool mask as an id list
            # (np.asarray(bool, int64) yields 0/1 indices — a silently
            # wrong filter, easy to hit after runtime capacity growth)
            raise ValueError(
                f"bool filter mask must have shape ({S * C},) — the "
                f"current total capacity — got {arr.shape}; pass ids "
                "for a sparse filter")
        if not (arr.dtype == bool and arr.shape == (S * C,)):
            mask = np.zeros(S * C, dtype=bool)
            mask[np.asarray(filter_fnc, dtype=np.int64)] = True
            arr = mask
        # gid = slot * S + shard: position gid of the flat mask lands at
        # [slot, shard] of a (C, S) view; transpose to the (S, C) layout
        return jnp.asarray(np.ascontiguousarray(arr.reshape(C, S).T))

    # ------------------------------------------------------------------
    # construction
    # ------------------------------------------------------------------

    def _fused_wave_fn(self, exact: bool, bucket: int, ubucket: int,
                       nscan: int, mw: int, mu: int, max_lvl: int = 0):
        """One SPMD launch running every shard's fused wave: exact MXU
        candidates (construct.insert_wave_fused — the single-chip build's
        decisive quality/speed win, VERDICT r2 #1) or the fused beam twin
        for custom metrics / past the exact threshold.  All wave lanes
        come from device cursors over the pre-uploaded slab: zero
        per-wave host->device arguments."""
        cfg = self._cfg

        def build():
            def run(st, dids, dvecs, dlvls, cur, ntot, panel):
                local = _squeeze(st)
                if exact:
                    out, c2 = insert_wave_fused(
                        cfg, local, dids[0], dvecs[0], dlvls[0], cur[0],
                        ntot[0], panel[0], bucket, ubucket, mw, nscan, mu,
                        max_lvl=max_lvl, scan2=bucket >= mw)
                else:
                    out, c2 = insert_wave_beam_fused(
                        cfg, local, dids[0], dvecs[0], dlvls[0], cur[0],
                        ntot[0], bucket, ubucket, mw, mu)
                return _expand(out), c2[None]

            specs = (self._state_specs(), P("shard"), P("shard"),
                     P("shard"), P("shard"), P("shard"), P("shard"))
            return jax.jit(
                _shard_map(run, self.mesh, specs,
                           (self._state_specs(), P("shard"))),
                donate_argnums=(0,))
        return self._cached(("fwave", exact, bucket, ubucket, nscan, mw,
                             mu, max_lvl), build)

    def add(self, vecs) -> np.ndarray:
        """Round-robin shard assignment + per-shard insert waves run as one
        SPMD program per wave.  Returns global int32 ids."""
        a = np.ascontiguousarray(np.asarray(vecs, np.float32))
        if a.ndim == 1:
            a = a[None]
        if a.shape[1] != self.dim:
            raise ValueError(f"expected dim={self.dim}, got {a.shape[1]}")
        n = a.shape[0]
        if n == 0:
            return np.empty(0, np.int32)
        self._invalidate_caches()
        S = self.n_shards
        C = self.shard_capacity
        lvls_all = G.sample_levels(self._rng, n,
                                   self.params.distribution_rate,
                                   self._cfg.max_levels)
        # round-robin assignment, starting from the least-filled shard
        order = np.argsort(self._counts, kind="stable")
        shard_of = order[np.arange(n) % S]
        # grow every shard BEFORE allocating slots (the mesh analog of the
        # reference's doubling resize, GraphData.cs:95-115; interleaved
        # gids make this id-stable).  Demand per shard is known up front.
        demand = np.bincount(shard_of, minlength=S)
        if self.params.allow_removals:
            demand = demand - np.minimum(
                demand, np.asarray([len(f) for f in self._free]))
        need = int((self._lengths + demand).max())
        if need > C:
            newC = C
            while newC < need:
                newC *= 2                  # GraphData.cs:100
            self._grow_shards(newC)
            C = self.shard_capacity
        # slot allocation: freed slots first (GraphData.cs:85-91), fresh
        # after
        slots = np.empty(n, dtype=np.int64)
        for s in range(S):
            mine = np.flatnonzero(shard_of == s)
            m = mine.size
            reuse = 0
            if self.params.allow_removals and self._free[s]:
                reuse = min(m, len(self._free[s]))
                slots[mine[:reuse]] = self._free[s][-reuse:][::-1]
                del self._free[s][-reuse:]
            fresh = m - reuse
            slots[mine[reuse:]] = self._lengths[s] + np.arange(fresh)
            self._lengths[s] += fresh
            self._counts[s] += m
            assert self._lengths[s] <= C
        gids = (slots * S + shard_of).astype(np.int32)

        # seed unseeded shards with their first item (host-side scatter)
        shard_of = shard_of.copy()
        for s in range(S):
            if self._seeded[s]:
                continue
            mine = np.flatnonzero(shard_of == s)
            if mine.size == 0:
                continue
            j = mine[0]
            local = G.seed_first_node(self._cfg, self._local(s),
                                      int(slots[j]), a[j], int(lvls_all[j]))
            self._set_local(s, local)
            self._seeded[s] = True
            if lvls_all[j] >= 1:
                self._upper_set[s].add(int(slots[j]))
            shard_of[j] = -1  # consumed

        queues = [np.flatnonzero(shard_of == s) for s in range(S)]
        self._drain_waves(queues, slots, a, lvls_all)
        return gids

    def _panel_device(self) -> jnp.ndarray:
        """(S, Cu) device panel of per-shard level>=1 local slots for
        construct.upper_connect_exact; -1 pads.  Width is a power-of-2
        ladder (floor _SPANEL_MIN) so the exact upper scan recompiles only
        on doublings.  Stale members (removed / not yet inserted) are
        masked on device via ``active``/``level``, exactly like the
        single-chip batch-wide panel (index._panel_append)."""
        S = self.n_shards
        width = max(_SPANEL_MIN,
                    _next_pow2(max(1, max(len(u) for u in self._upper_set))))
        arr = np.full((S, width), -1, np.int32)
        for s, ups in enumerate(self._upper_set):
            if ups:
                arr[s, :len(ups)] = np.fromiter(ups, np.int32, len(ups))
        return jnp.asarray(arr)

    def _drain_waves(self, queues, slot_of, vecs, lvls) -> None:
        """Run per-shard insert queues through ONE fused SPMD wave program
        per wave, with the single-chip engine's two decisive build wins
        ported to the mesh (VERDICT r2 #1):

        * **exact MXU candidates** — below params.exact_build_threshold
          each shard's wave connects from exact brute-force candidates
          (construct.insert_wave_fused), not beam candidates; past the
          threshold the fused beam twin runs instead;
        * **upload-free waves** — each shard's whole queue is uploaded
          once per slab and every wave's lanes are sliced ON DEVICE from
          per-shard cursors (construct.wave_head).  Zero per-wave
          host->device arguments: through a tunneled backend each upload
          costs 30-130 ms, which capped the old per-wave-upload drain at
          ~5.5k inserts/s at any corpus size.

        The host mirrors the device scheduler exactly (it owns counts and
        levels) under the same doubling throttle as the single-chip index:
        a shard holding b nodes accepts at most b items per wave, so early
        waves stay small and graph quality holds.  ``queues[s]`` holds
        indices j into ``slot_of``/``vecs``/``lvls``."""
        S = self.n_shards
        C = self.shard_capacity
        queues = [np.asarray(q, dtype=np.int64) for q in queues]
        nq = np.array([q.size for q in queues], dtype=np.int64)
        if nq.sum() == 0:
            return
        exactable = not dst.is_custom(self.metric)
        if exactable:
            for s in range(S):
                if nq[s]:
                    ups = slot_of[queues[s]][lvls[queues[s]] >= 1]
                    self._upper_set[s].update(int(x) for x in ups)
        panel = self._panel_device() if exactable \
            else jnp.zeros((S, 1), jnp.int32)
        mw = min(max(1, self.params.max_wave_size // S), WAVE_BUCKETS[-1])
        mu = UPPER_BUCKETS[-1]
        thresh = self.params.exact_build_threshold
        built = self._counts - nq              # live-count mirror per shard
        rem = nq.copy()
        done = np.zeros(S, dtype=np.int64)     # consumed per shard
        slab = max(512, (1 << 29) // max(1, S * self.dim * 4))
        while rem.any():
            take = np.minimum(rem, slab)
            npad = max(8, 1 << int(max(1, take.max()) - 1).bit_length())
            ids_h = np.zeros((S, npad), np.int32)
            lvl_h = np.zeros((S, npad), np.int32)
            vec_h = np.zeros((S, npad, self.dim), np.float32)
            hwm_h = np.zeros((S, npad), np.int64)  # per-wave scan prefix
            for s in range(S):
                t = int(take[s])
                if t == 0:
                    continue
                q = queues[s][done[s]:done[s] + t]
                ids_h[s, :t] = slot_of[q]
                lvl_h[s, :t] = lvls[q]
                vec_h[s, :t] = vecs[q]
                hwm_h[s, :t] = np.maximum.accumulate(slot_of[q]) + 1
                hwm_h[s, t:] = hwm_h[s, t - 1]
            # ONE upload per slab; all waves below slice it via cursors
            dids = jnp.asarray(ids_h)
            dlvls = jnp.asarray(lvl_h)
            dvecs = jnp.asarray(vec_h)
            ntot = jnp.asarray(take.astype(np.int32))
            cur = jnp.zeros((S,), jnp.int32)
            k = np.zeros(S, dtype=np.int64)    # host cursor mirror
            srem = take.copy()
            while srem.any():
                w = np.minimum(np.minimum(mw, np.maximum(1, built)), srem)
                upcnt = np.zeros(S, dtype=np.int64)
                for s in range(S):
                    if w[s] == 0:
                        continue
                    upc = np.cumsum(lvl_h[s, k[s]:k[s] + w[s]] >= 1)
                    if w[s] > mu and upc[-1] > mu:
                        # wave_head's prefix cap on level>=1 members
                        w[s] = int(np.searchsorted(upc, mu, side="right"))
                    upcnt[s] = upc[w[s] - 1]
                bucket = _bucket(int(w.max()), WAVE_BUCKETS)
                bu = _bucket(int(upcnt.max()), UPPER_BUCKETS) \
                    if upcnt.any() else 0
                # bound the upper phase's layer loop to the wave's top
                # level across shards (bucketed — see index._lvl_bucket)
                ml = 0
                if bu:
                    ml = _lvl_bucket(max(
                        int(lvl_h[s, k[s]:k[s] + w[s]].max())
                        for s in range(S) if w[s]))
                exact = exactable and int(built.max()) <= thresh
                nscan = 0
                if exact:
                    hw = max(int(hwm_h[s, k[s] + w[s] - 1])
                             for s in range(S) if w[s]) \
                        if w.any() else 1
                    self._shwm = max(self._shwm, hw)
                    nscan = min(C, max(SCAN_FLOOR,
                                       _next_pow2(self._shwm)))
                if self._wave_trace is not None:
                    self._wave_trace.append(w.copy())
                fn = self._fused_wave_fn(exact, bucket, bu, nscan, mw, mu,
                                         ml if exact else 0)
                self._state, cur = fn(self._state, dids, dvecs, dlvls,
                                      cur, ntot, panel)
                built += w
                srem -= w
                k += w
            rem -= take
            done += take

    # ------------------------------------------------------------------
    # queries
    # ------------------------------------------------------------------

    def _query_fn(self, ef: int, max_iters: int, filtered: bool,
                  layer: int):
        cfg = self._cfg
        C = self.shard_capacity
        expand = max(1, self.params.query_expand)

        def build():
            def run(st, q, fm):
                local = _squeeze(st)
                d, i = knn_search(cfg, local, q, layer, ef, max_iters,
                                  filtered=filtered,
                                  filter_mask=fm[0] if filtered else None,
                                  expand=expand)
                sid = lax.axis_index("shard").astype(jnp.int32)
                gi = jnp.where(i >= 0, i * self.n_shards + sid, -1)
                return d[None], gi[None]

            specs = (self._state_specs(), P(), P("shard"))
            shmapped = _shard_map(run, self.mesh, specs,
                                  (P("shard"), P("shard")))

            @jax.jit
            def query(st, q, fm):
                d, gi = shmapped(st, q, fm)          # (S, B, ef) each
                B = q.shape[0]
                dd = jnp.swapaxes(d, 0, 1).reshape(B, -1)
                ii = jnp.swapaxes(gi, 0, 1).reshape(B, -1)
                order = jnp.argsort(dd, axis=1)  # argsort+take: multi-
                # operand lax.sort is ~30x slower on TPU
                sd = jnp.take_along_axis(dd, order, axis=1)
                si = jnp.take_along_axis(ii, order, axis=1)
                return sd[:, :ef], si[:, :ef]

            return query
        return self._cached(
            ("query", ef, max_iters, filtered, expand, layer), build)

    def _get_pack(self):
        """Lazily build the per-shard packed-neighborhood tables (stacked
        core/pack.QueryPack, one per shard, built in one SPMD program).
        Same gating as HNSWIndex._get_pack, applied per shard: the pack
        budget (params.pack_max_bytes) is a per-device HBM budget, so a
        corpus that cannot pack on one chip serves packed from however
        many shards make each piece fit.  None means 'serve unpacked'."""
        mode = self.params.pack_queries
        if mode == "off":
            return None
        if mode == "auto" and self.count < self.params.pack_min_count:
            return None
        if self._pack is not None:
            return self._pack
        from ..core import pack as PK
        S = self.n_shards
        C = self.shard_capacity
        # pack tiles cap at 2M (build_pack slices off reverse_slack lanes)
        K = min(self._state.nbr0.shape[2], 2 * self.params.max_edges)
        # the budget (and hence the dtype resolution) applies PER SHARD —
        # each device holds its own pack slice
        from ..index import resolve_pack_dtype
        res_dtype = resolve_pack_dtype(self.params, C, K, self.dim)
        if res_dtype is None:
            return None
        # per-shard entry set: smallest upper level whose population fits
        # the flat MXU entry scan (HNSWIndex._get_pack semantics).  level
        # and active mirrors are ~5 bytes/row — read once per mutation
        # epoch, far below the pack build's own cost.
        lvl = np.asarray(self._state.level)
        act = np.asarray(self._state.active)
        ents = []
        cap = PK.entry_scan_cap(self.metric)
        for s in range(S):
            eids = None
            for layer in range(1, int(self._cfg.max_levels)):
                members = np.flatnonzero((lvl[s] >= layer) & act[s])
                if members.size <= cap:
                    eids = members
                    break
            if eids is None or eids.size == 0:
                # all of this shard lives at level 0 (tiny shard): any
                # live node seeds the beam; an empty shard stays empty
                eids = np.flatnonzero(act[s])[:1]
            ents.append(eids)
        E = max(1, max(e.size for e in ents))
        E = 1 << max(0, int(E - 1).bit_length())
        table = np.full((S, E), -1, np.int64)
        for s, e in enumerate(ents):
            table[s, :e.size] = e
        self._pack = self._pack_build_fn(res_dtype)(
            self._state, jnp.asarray(table, jnp.int32))
        return self._pack

    def _pack_build_fn(self, res_dtype=jnp.bfloat16):
        cfg = self._cfg
        from ..core import pack as PK

        def build():
            def run(st, ents):
                local = _squeeze(st)
                return _expand(PK.make_query_pack(cfg, local, ents[0],
                                                  res_dtype))

            specs = (self._state_specs(), P("shard"))
            out_specs = PK.QueryPack(
                *(P("shard") for _ in PK.QueryPack._fields))
            return jax.jit(_shard_map(run, self.mesh, specs, out_specs))
        return self._cached(("packbuild", jnp.dtype(res_dtype).name), build)

    def _pack_query_fn(self, ef: int, max_iters: int, filtered: bool,
                       expand: int, n_entry: int):
        cfg = self._cfg
        C = self.shard_capacity
        from ..core import pack as PK

        def build():
            def run(pk, q, fm):
                d, i = PK.packed_knn_search(
                    cfg, _squeeze(pk), q, ef, max_iters, filtered=filtered,
                    filter_mask=fm[0] if filtered else None,
                    expand=expand, n_entry=n_entry)
                sid = lax.axis_index("shard").astype(jnp.int32)
                gi = jnp.where(i >= 0, i * self.n_shards + sid, -1)
                return d[None], gi[None]

            pk_specs = PK.QueryPack(
                *(P("shard") for _ in PK.QueryPack._fields))
            specs = (pk_specs, P(), P("shard"))
            shmapped = _shard_map(run, self.mesh, specs,
                                  (P("shard"), P("shard")))

            @jax.jit
            def query(pk, q, fm):
                d, gi = shmapped(pk, q, fm)          # (S, B, ef) each
                B = q.shape[0]
                dd = jnp.swapaxes(d, 0, 1).reshape(B, -1)
                ii = jnp.swapaxes(gi, 0, 1).reshape(B, -1)
                order = jnp.argsort(dd, axis=1)  # argsort+take: multi-
                # operand lax.sort is ~30x slower on TPU
                sd = jnp.take_along_axis(dd, order, axis=1)
                si = jnp.take_along_axis(ii, order, axis=1)
                return sd[:, :ef], si[:, :ef]

            return query
        return self._cached(
            ("pquery", ef, max_iters, filtered, expand, n_entry), build)

    def _exact_query_fn(self, k: int, filtered: bool, nscan: int):
        cfg = self._cfg
        C = self.shard_capacity
        from ..ops.bruteforce import exact_knn

        def build():
            def run(st, q, layer, fm):
                local = _squeeze(st)
                # scan only the slot prefix any shard has filled (nscan =
                # bucketed max high-water mark): survivor positions are
                # local slots either way, and half-full shards skip half
                # the matmul
                allowed = (local.active & (local.level >= layer[0]))[:nscan]
                if filtered:
                    allowed = allowed & fm[0][:nscan]
                ct = local.coarse_table
                if ct is not None:
                    from ..ops.bruteforce import exact_knn2
                    d, i = exact_knn2(cfg.metric, local.vectors, ct[:nscan],
                                      local.norms[:nscan], allowed, q, k)
                else:
                    d, i = exact_knn(cfg.metric, local.vlo[:nscan],
                                     local.norms[:nscan], allowed, q, k)
                sid = lax.axis_index("shard").astype(jnp.int32)
                gi = jnp.where(i >= 0, i * self.n_shards + sid, -1)
                return d[None], gi[None]

            specs = (self._state_specs(), P(), P(), P("shard"))
            shmapped = _shard_map(run, self.mesh, specs,
                                  (P("shard"), P("shard")))

            @jax.jit
            def query(st, q, layer, fm):
                d, gi = shmapped(st, q, layer, fm)   # (S, B, k) each
                B = q.shape[0]
                dd = jnp.swapaxes(d, 0, 1).reshape(B, -1)
                ii = jnp.swapaxes(gi, 0, 1).reshape(B, -1)
                order = jnp.argsort(dd, axis=1)[:, :k]
                return (jnp.take_along_axis(dd, order, axis=1),
                        jnp.take_along_axis(ii, order, axis=1))

            return query
        return self._cached(("exact", k, filtered, nscan), build)

    def _exact_nscan(self) -> int:
        """Power-of-2 scan prefix covering every shard's filled slots
        (8192 floor keeps the fused lane-min scan's alignment)."""
        C = self.shard_capacity
        hwm = int(self._lengths.max()) if self._lengths.size else 0
        p = 8192
        while p < hwm:
            p <<= 1
        return min(p, C)

    def _fm_or_dummy(self, fmask):
        if fmask is not None:
            return fmask
        return jnp.zeros((self.n_shards, 1), bool)   # placeholder (unused)

    def knn_query(self, queries, k: int, filter_fnc=None, layer: int = 0,
                  exact: bool = False):
        """Fan-out batched k-NN: per-shard beams (or per-shard exact MXU
        scoring with ``exact=True``) + global top-k merge over ICI.
        Returns (ids (n, k) int32, dists (n, k) float32), -1/NaN padded,
        refined in float64 (the same contract as HNSWIndex)."""
        q = np.ascontiguousarray(np.asarray(queries, np.float32))
        if q.ndim == 1:
            q = q[None]
        n = q.shape[0]
        if self.count == 0 or k < 1:
            return (np.full((n, k), -1, np.int32),
                    np.full((n, k), np.nan, np.float32))
        if callable(filter_fnc):
            return self._knn_query_callable(q, k, filter_fnc, int(layer),
                                            exact)
        fmask = self._global_filter_mask(filter_fnc)
        filtered = fmask is not None
        if exact:
            layer_j = jnp.full((self.n_shards,), layer, jnp.int32)
            fn = self._exact_query_fn(k, filtered, self._exact_nscan())
            d, i = fn(self._state, jnp.asarray(q), layer_j,
                      self._fm_or_dummy(fmask))
        else:
            ef = max(self.params.min_nn, k)
            expand = max(1, self.params.query_expand)
            max_iters = (self._cfg.search_iter_factor * ef) // expand + 16
            pk = self._get_pack() if layer == 0 else None
            if pk is not None:
                fn = self._pack_query_fn(ef, max_iters, filtered, expand,
                                         min(8, ef))
                d, i = fn(pk, jnp.asarray(q), self._fm_or_dummy(fmask))
            else:
                fn = self._query_fn(ef, max_iters, filtered, int(layer))
                d, i = fn(self._state, jnp.asarray(q),
                          self._fm_or_dummy(fmask))
        return self._refine_global(q, np.asarray(i), k)

    def _knn_query_callable(self, q: np.ndarray, k: int, pred, layer: int,
                            exact: bool) -> Tuple[np.ndarray, np.ndarray]:
        """Callable-predicate filtering: search unfiltered with a widened
        beam, evaluate the predicate only on returned candidates, widen
        further for queries short of k passing results (the single-chip
        HNSWIndex._knn_query_callable contract, ported to the mesh)."""
        from ..utils.predicates import BatchedPredicate

        n = q.shape[0]
        out_ids = np.full((n, k), -1, np.int32)
        out_d = np.full((n, k), np.nan, np.float32)
        cache: dict = {}
        bpred = BatchedPredicate(pred)

        def prefetch(ids_np):
            # one bulk mesh gather + one (validated) vectorized predicate
            # call per round — not a Python call per row
            fresh = [x for x in np.unique(ids_np[ids_np >= 0]).tolist()
                     if x not in cache]
            if not fresh:
                return
            rows = self._rows_global(np.asarray(fresh, np.int64))
            cache.update(zip(fresh, bpred(rows).tolist()))

        pending = np.arange(n)
        ef = max(self.params.min_nn, 2 * k, 16)
        cap = 1 << max(4, int(max(self.count, 1) - 1).bit_length())
        cap = min(4096, cap)
        dummy = self._fm_or_dummy(None)
        # exact-scan escape, same contract as the single-chip facade
        # (index._knn_query_callable): a beam saturated at the ef cap
        # while still short of k passing results gets ONE exact top-`cap`
        # round before finalizing short — selective predicates no longer
        # under-fill on the mesh where they would not on one chip
        mode_exact = exact and not dst.is_custom(self.metric)
        can_escalate = not mode_exact and not dst.is_custom(self.metric)
        while pending.size:
            sub = jnp.asarray(q[pending])
            if mode_exact:
                eff = min(ef, max(self.count, 1))
                layer_j = jnp.full((self.n_shards,), layer, jnp.int32)
                fn = self._exact_query_fn(eff, False, self._exact_nscan())
                _, gi = fn(self._state, sub, layer_j, dummy)
            else:
                expand = max(1, self.params.query_expand)
                mi = (self._cfg.search_iter_factor * ef) // expand + 16
                pk = self._get_pack() if layer == 0 else None
                if pk is not None:
                    fn = self._pack_query_fn(ef, mi, False, expand,
                                             min(8, ef))
                    _, gi = fn(pk, sub, dummy)
                else:
                    fn = self._query_fn(ef, mi, False, int(layer))
                    _, gi = fn(self._state, sub, dummy)
            ids = np.asarray(gi)
            prefetch(ids)
            still = []
            saturated = ef >= cap
            for r, qi in enumerate(pending):
                row = ids[r]
                keep = [int(x) for x in row if x >= 0 and cache[int(x)]]
                starved = (row >= 0).sum() < ids.shape[1]
                if len(keep) >= k or starved or \
                        (saturated and not can_escalate):
                    got = np.full(k, -1, np.int32)
                    got[: min(k, len(keep))] = keep[:k]
                    rid, rd = self._refine_global(q[qi:qi + 1],
                                                  got[None, :], k)
                    out_ids[qi], out_d[qi] = rid[0], rd[0]
                else:
                    still.append(qi)
            pending = np.asarray(still, dtype=np.int64)
            if saturated and can_escalate and pending.size:
                mode_exact, can_escalate = True, False
            else:
                ef = min(cap, ef * 4)
        return out_ids, out_d

    def _range_fn(self, pool: int, max_iters: int, filtered: bool,
                  layer: int):
        cfg = self._cfg
        C = self.shard_capacity

        def build():
            def run(st, q, radius, fm):
                local = _squeeze(st)
                B = q.shape[0]
                qn = dst.norm_data(cfg.metric, q)
                ep_ok = jnp.broadcast_to(local.ep >= 0, (B,))
                # multi-seed from a preliminary k-NN beam (see
                # core.search.range_search)
                seed_ef = 16
                _, seeds = knn_search(cfg, local, q, layer, seed_ef,
                                      cfg.search_iter_factor * seed_ef + 16)
                d, i, sat = range_search(
                    cfg, local, q, qn, seeds,
                    jnp.broadcast_to(ep_ok[:, None], seeds.shape),
                    layer, radius[0],
                    pool, max_iters, filtered=filtered,
                    filter_mask=fm[0] if filtered else None)
                sid = lax.axis_index("shard").astype(jnp.int32)
                gi = jnp.where(i >= 0, i * self.n_shards + sid, -1)
                return d[None], gi[None], sat[None]

            specs = (self._state_specs(), P(), P(), P("shard"))
            return jax.jit(_shard_map(run, self.mesh, specs,
                                      (P("shard"), P("shard"), P("shard"))))
        return self._cached(("range", pool, max_iters, filtered, layer),
                            build)

    def range_query(self, queries, radius: float, filter_fnc=None,
                    layer: int = 0):
        """Batched radius search across all shards (HNSWIndex.cs:144-168):
        per-shard range beams, global merge, ragged (ids, dists) output
        ascending by f64-refined distance."""
        q = np.ascontiguousarray(np.asarray(queries, np.float32))
        if q.ndim == 1:
            q = q[None]
        n = q.shape[0]
        if self.count == 0:
            return ([np.empty(0, np.int32) for _ in range(n)],
                    [np.empty(0, np.float32) for _ in range(n)])
        # callable predicates are evaluated on the returned in-range
        # candidates only (range results are not truncated to a top-k, so
        # post-filtering is exact — HNSWIndex.range_query semantics)
        pred = filter_fnc if callable(filter_fnc) else None
        fmask = None if pred else self._global_filter_mask(filter_fnc)
        filtered = fmask is not None
        fm = self._fm_or_dummy(fmask)
        S = self.n_shards
        radius_j = jnp.full((S,), radius, jnp.float32)
        qj = jnp.asarray(q)
        for pool in RANGE_POOLS:
            fn = self._range_fn(pool, pool * 4 + 16, filtered, int(layer))
            d, gi, sat = fn(self._state, qj, radius_j, fm)
            if not bool(np.asarray(sat).any()):
                break
        # shard/query pairs still saturated at the pool cap get an exact
        # per-shard scan (the single-chip facade's overflow path,
        # HNSWIndex._range_exact_host) so dense radii stay complete
        sat_np = np.asarray(sat)
        # (S, n, pool) -> per-query merged ragged rows
        gi = np.swapaxes(np.asarray(gi), 0, 1).reshape(n, -1)
        ids_out, d_out = [], []
        for r in range(n):
            row = gi[r]
            row = row[row >= 0]
            if sat_np[:, r].any():
                extra = [row]
                for s in np.flatnonzero(sat_np[:, r]):
                    extra.append(self._range_exact_shard(
                        int(s), q[r], radius, fmask, int(layer)))
                row = np.unique(np.concatenate(extra))
            if row.size == 0:
                ids_out.append(np.empty(0, np.int32))
                d_out.append(np.empty(0, np.float32))
                continue
            rid, rd = self._refine_global(q[r:r + 1], row[None, :],
                                          row.size)
            keep = (rid[0] >= 0) & (rd[0] <= radius)
            if pred is not None:
                rows_v = self._rows_global(rid[0])
                ok = np.asarray([bool(pred(v)) for v in rows_v])
                keep = keep & ok
            ids_out.append(rid[0][keep])
            d_out.append(rd[0][keep])
        return ids_out, d_out

    def _range_exact_shard(self, s: int, q1: np.ndarray, radius: float,
                           fmask, layer: int) -> np.ndarray:
        """Exact in-range global ids of one shard for one query — the
        overflow path for radii denser than the pool cap (mirrors
        HNSWIndex._range_exact_host)."""
        local = self._local(s)
        C = self.shard_capacity
        allowed = local.active
        if layer > 0:
            allowed = allowed & (local.level >= layer)
        if fmask is not None:
            allowed = allowed & fmask[s]
        if dst.is_custom(self.metric):
            # one shard's vectors only (1/S of the corpus); a Python
            # metric can only run on the host
            hv = self._host_vecs()[s] if self._mirrorable() \
                else np.asarray(self._state.vectors[s])
            d = np.asarray(dst.exact(self.metric,
                                     q1[None, :].astype(np.float32),
                                     hv.astype(np.float32)),
                           dtype=np.float64).ravel()
            d = np.where(np.asarray(allowed), d, np.inf)
            hit = np.flatnonzero(d <= radius)
        else:
            from ..ops.bruteforce import range_distances
            d = np.asarray(range_distances(
                self._cfg.metric, local.vectors, local.norms, allowed,
                jnp.asarray(q1), jnp.float32(radius)))
            hit = np.flatnonzero(np.isfinite(d))
        return (hit * self.n_shards + s).astype(np.int64)

    def _layer_beam_fn(self, k: int, max_iters: int, layer: int):
        cfg = self._cfg
        C = self.shard_capacity

        def build():
            def run(st, q, entry, on):
                local = _squeeze(st)
                qn = dst.norm_data(cfg.metric, q)
                d, i = beam_search(cfg, local, q, qn, entry[0], on[0],
                                   layer, k, max_iters)
                sid = lax.axis_index("shard").astype(jnp.int32)
                gi = jnp.where(i >= 0, i * self.n_shards + sid, -1)
                return d[None], gi[None], i[None, :, :1]

            specs = (self._state_specs(), P(), P("shard"), P("shard"))
            return jax.jit(_shard_map(
                run, self.mesh, specs, (P("shard"), P("shard"), P("shard"))))
        return self._cached(("mlayer", k, max_iters, layer), build)

    def multi_layer_knn_query(self, query, k: int,
                              max_layer: int = 2 ** 30, min_layer: int = 0):
        """Per-layer k-NN chain (MultiLayerKnnQuery, HNSWIndex.cs:173-187)
        across shards: each shard chains its own per-layer best as its next
        entry; results merge globally per layer, dropping the closest (the
        reference drops it at HNSWIndex.cs:184)."""
        if self.count == 0 or k < 1:
            return []
        q = np.ascontiguousarray(np.asarray(query, np.float32))
        if q.ndim == 1:
            q = q[None]
        q = q[:1]
        S = self.n_shards
        eps = np.asarray(self._state.ep)            # (S,)
        tops = np.asarray(self._ep_tops())
        top = int(min(max(tops), max_layer))
        if top < 0:
            return []
        result = [None] * (top + 1)
        max_iters = self._cfg.search_iter_factor * k + 16
        entry = eps.astype(np.int32).reshape(S, 1)
        qj = jnp.asarray(q)
        for layer in range(top, min_layer - 1, -1):
            fn = self._layer_beam_fn(k, max_iters, layer)
            on = ((tops >= layer) & (eps >= 0)).reshape(S, 1)
            d, gi, loc = fn(self._state, qj,
                            jnp.asarray(entry), jnp.asarray(on))
            gi_np = np.swapaxes(np.asarray(gi), 0, 1).reshape(1, -1)
            rid, rd = self._refine_global(q, gi_np, k)
            valid = rid[0] >= 0
            result[layer] = (rid[0][valid][1:], rd[0][valid][1:])
            # chain each shard's own best as its next entry
            loc_np = np.asarray(loc).reshape(S, 1)
            entry = np.where(loc_np >= 0, loc_np, entry).astype(np.int32)
        return result

    # ------------------------------------------------------------------
    # mutation
    # ------------------------------------------------------------------

    # -- SPMD removal program builders ---------------------------------
    # One shard_map launch per phase covering EVERY shard (VERDICT r4 #5:
    # the old per-shard host loop ran the whole repair serially per shard,
    # paying ~S x the single-chip removal wall on an S-shard mesh).  The
    # chunk loops stay host-driven (the measured-negative device-side
    # fusion in benchmarks/RESULTS.md does not apply — this batches the
    # SAME host-driven programs across shards, it does not trace the
    # chunk loop).

    def _rm_mark_fn(self, b: int):
        from ..core.remove import mark_removed

        def build():
            def run(st, rem):
                return _expand(mark_removed(self._cfg, _squeeze(st),
                                            rem[0]))
            return jax.jit(
                _shard_map(run, self.mesh,
                           (self._state_specs(), P("shard")),
                           self._state_specs()),
                donate_argnums=(0,))
        return self._cached(("rm_mark", b), build)

    def _rm_aff_fn(self, b: int):
        from ..core.remove import affected_masks_all

        def build():
            def run(st, rem):
                a, m = affected_masks_all(self._cfg, _squeeze(st), rem[0])
                return a[None], m[None]
            return jax.jit(
                _shard_map(run, self.mesh,
                           (self._state_specs(), P("shard")),
                           (P("shard"), P("shard"))))
        return self._cached(("rm_aff", b), build)

    def _rm_cand_fn(self, sb: int, b: int, layer: int, remove_ef: int,
                    ns: int, exact: bool):
        from ..core.remove import exact_repair_candidates, \
            repair_candidates

        def build():
            max_iters = self._cfg.search_iter_factor * remove_ef + 16

            def run(st, scan, rem):
                local = _squeeze(st)
                if exact:
                    out = exact_repair_candidates(
                        self._cfg, local, scan[0],
                        jnp.asarray(layer, jnp.int32), remove_ef, ns)
                else:
                    out = repair_candidates(self._cfg, local, scan[0],
                                            rem[0], layer, remove_ef,
                                            max_iters)
                return out[None]
            return jax.jit(
                _shard_map(run, self.mesh,
                           (self._state_specs(), P("shard"), P("shard")),
                           P("shard")))
        return self._cached(("rm_cand", sb, b, layer, remove_ef, ns,
                             exact), build)

    def _rm_slice_fn(self, layer: int):
        from ..core.remove import _slice_layer

        def build():
            def run(st):
                nbr_l, deg_l = _slice_layer(_squeeze(st), layer)
                return nbr_l[None], deg_l[None]
            return jax.jit(
                _shard_map(run, self.mesh, (self._state_specs(),),
                           (P("shard"), P("shard"))))
        return self._cached(("rm_slice", layer), build)

    def _rm_wb_fn(self, layer: int, b: int):
        """Write the repaired layer slice back AND clear the removed
        nodes' own rows (one launch — the clear is a scatter on the
        already-donated slice)."""
        from ..core.remove import _clear_rows_slice, _writeback_layer

        def build():
            def run(st, nbr_l, deg_l, rem):
                n2, d2 = _clear_rows_slice(nbr_l[0], deg_l[0], rem[0])
                return _expand(_writeback_layer(_squeeze(st), n2, d2,
                                                layer))
            return jax.jit(
                _shard_map(run, self.mesh,
                           (self._state_specs(), P("shard"), P("shard"),
                            P("shard")),
                           self._state_specs()),
                donate_argnums=(0, 1, 2))
        return self._cached(("rm_wb", layer, b), build)

    def _rm_chunk_fn(self, cb: int, b: int, sb: int, max_deg: int,
                     fanin: int, span: int, fill: int):
        from ..core.remove import repair_chunk

        def build():
            def run(st, nbr_l, deg_l, chunk, rem, scan, scand):
                local = _squeeze(st)
                n2, d2 = repair_chunk(self._cfg, local.vlo, local.norms,
                                      nbr_l[0], deg_l[0], chunk[0],
                                      rem[0], scan[0], scand[0], max_deg,
                                      fanin, span, fill)
                return n2[None], d2[None]
            return jax.jit(
                _shard_map(run, self.mesh,
                           (self._state_specs(),) + (P("shard"),) * 6,
                           (P("shard"), P("shard"))),
                donate_argnums=(1, 2))
        return self._cached(("rm_chunk", cb, b, sb, max_deg, fanin, span,
                             fill), build)

    def _rm_chunk_rows(self, nbr_l, deg_l, rows_s, rem_j, scan_j, scand,
                       max_deg, fanin, span, fill):
        """Drive one repair tier across all shards: host-chunked like the
        single-chip _repair_rows, but each launch repairs one chunk on
        EVERY shard (shards short of rows get -1 padding)."""
        from ..core.remove import CHUNK_BUCKETS
        S = self.n_shards
        done = np.zeros(S, dtype=np.int64)
        sizes = np.asarray([r.size for r in rows_s])
        while (done < sizes).any():
            take = min(int((sizes - done).max()), CHUNK_BUCKETS[-1])
            cb = next(c for c in CHUNK_BUCKETS if c >= take)
            cpad = np.full((S, cb), -1, dtype=np.int32)
            for s in range(S):
                t = rows_s[s][done[s]:done[s] + take]
                cpad[s, :t.size] = t
                done[s] += t.size
            fn = self._rm_chunk_fn(cb, rem_j.shape[1], scan_j.shape[1],
                                   max_deg, fanin, span, fill)
            if self._rm_trace is not None:
                self._rm_trace.append(("chunk", cb, fanin))
            nbr_l, deg_l = fn(self._state, nbr_l, deg_l,
                              jnp.asarray(cpad), rem_j, scan_j, scand)
        return nbr_l, deg_l

    def remove(self, gids) -> None:
        """Remove by global id with SPMD graph repair and slot recycling
        (freed slots are handed out again by add).  Every repair phase is
        one shard_map launch covering all shards — an S-shard mesh pays
        ~the single-chip removal wall, not S x it."""
        if not self.params.allow_removals:
            raise RuntimeError("Removals are disabled in this index "
                               "instance.")
        from ..core.remove import resolve_quality
        S, C = self.n_shards, self.shard_capacity
        arr = np.unique(np.asarray(gids, dtype=np.int64).ravel())
        # out-of-range ids are ignored like inactive ones (negative gids
        # would otherwise wrap through numpy indexing onto live nodes)
        arr = arr[(arr >= 0) & (arr < S * C)]
        if arr.size == 0:
            return
        self._invalidate_caches()
        # bulk/churn escalation decided once on the GLOBAL wave vs the
        # global live count — per-shard resolution would flip presets
        # between shards on skewed id distributions
        quality = resolve_quality(self.params.remove_quality, arr.size,
                                  int(sum(self._counts)))
        active = np.asarray(self._state.active)
        shard_of = arr % S
        local_of = (arr // S).astype(np.int32)
        mine_s = []
        for s in range(S):
            mine = local_of[shard_of == s]
            mine_s.append(mine[active[s][mine]])
        if not any(m.size for m in mine_s):
            return
        self._remove_spmd(mine_s, quality)
        for s in range(S):
            self._free[s].extend(int(x) for x in mine_s[s])
            self._counts[s] -= mine_s[s].size
            self._upper_set[s].difference_update(
                int(x) for x in mine_s[s])

    def _remove_spmd(self, mine_s, quality: str) -> None:
        """SPMD engine core of remove(): the mesh form of
        core.remove.remove_from_state, with (S, ...) leading axes and one
        launch per phase."""
        from ..core.remove import repair_widths
        S, C = self.n_shards, self.shard_capacity
        cfg = self._cfg
        remove_ef = self.params.remove_max_candidates
        r_fanin, r_span, r_span1, r_fill = repair_widths(quality)
        exact = not dst.is_custom(self.metric)
        # candidate-scan prefix (power-of-2 over the built slots, global
        # across shards so the compiled program is uniform)
        p = 8192
        while p < max(1, self._shwm):
            p <<= 1
        ns = min(p, C)
        cap = 32768 if C <= (1 << 21) else 4096
        buckets = (8, 64, 512, 4096, cap)

        def bucket(n):
            for b in buckets:
                if n <= b:
                    return b
            return buckets[-1]

        # levels of the removed ids, one gather for the whole mesh
        lv_s = []
        flat_sh = np.concatenate(
            [np.full(m.size, s, np.int64) for s, m in enumerate(mine_s)]
        ) if any(m.size for m in mine_s) else np.empty(0, np.int64)
        flat_lid = np.concatenate([m for m in mine_s]).astype(np.int64)
        lv_all = np.asarray(self._state.level[
            jnp.asarray(flat_sh), jnp.asarray(flat_lid)]) \
            if flat_lid.size else np.empty(0, np.int32)
        off = 0
        for m in mine_s:
            lv_s.append(lv_all[off:off + m.size])
            off += m.size

        max_n = max(m.size for m in mine_s)
        for start in range(0, max_n, buckets[-1]):
            waves = [m[start:start + buckets[-1]] for m in mine_s]
            wlvls = [lv[start:start + buckets[-1]] for lv in lv_s]
            b = bucket(max(w.size for w in waves))
            rem = np.full((S, b), -1, dtype=np.int32)
            for s, w in enumerate(waves):
                rem[s, :w.size] = w
            rem_j = jnp.asarray(rem)

            if self._rm_trace is not None:
                self._rm_trace.append(("mark", b))
            self._state = self._rm_mark_fn(b)(self._state, rem_j)
            top = int(max((int(lv.max()) if lv.size else 0)
                          for lv in wlvls))
            aff_j, multi_j = self._rm_aff_fn(b)(self._state, rem_j)
            aff_all = np.unpackbits(
                np.asarray(aff_j), axis=-1)[:, :, :C].astype(bool)
            multi_all = np.unpackbits(
                np.asarray(multi_j), axis=-1)[:, :, :C].astype(bool)
            for l in range(top, -1, -1):
                if l == 0:
                    scan_j = rem_j
                else:
                    on_l = [w[lv >= l] for w, lv in zip(waves, wlvls)]
                    sb = bucket(max(o.size for o in on_l))
                    spad = np.full((S, sb), -1, dtype=np.int32)
                    for s, o in enumerate(on_l):
                        spad[s, :o.size] = o
                    scan_j = jnp.asarray(spad)
                scand = self._rm_cand_fn(
                    int(scan_j.shape[1]), b, l, remove_ef, ns, exact)(
                        self._state, scan_j, rem_j)
                max_deg = cfg.max_degree(l == 0)
                fast_s = [np.flatnonzero(aff_all[s, l] & ~multi_all[s, l])
                          for s in range(S)]
                slow_s = [np.flatnonzero(multi_all[s, l])
                          for s in range(S)]
                nbr_l, deg_l = self._rm_slice_fn(l)(self._state)
                nbr_l, deg_l = self._rm_chunk_rows(
                    nbr_l, deg_l, fast_s, rem_j, scan_j, scand, max_deg,
                    1, r_span1, min(r_fill, max_deg))
                nbr_l, deg_l = self._rm_chunk_rows(
                    nbr_l, deg_l, slow_s, rem_j, scan_j, scand, max_deg,
                    r_fanin, r_span, min(r_fill, max_deg))
                self._state = self._rm_wb_fn(l, b)(
                    self._state, nbr_l, deg_l, rem_j)

    def update(self, gids, vecs) -> None:
        """Replace stored vectors keeping their global ids (remove +
        reinsert into the same slots with fresh levels/edges, the public
        form of GraphData.UpdateItem, GraphData.cs:133-140)."""
        arr = np.asarray(gids, dtype=np.int64).ravel()
        a = np.ascontiguousarray(np.asarray(vecs, np.float32))
        if a.ndim == 1:
            a = a[None]
        if arr.size != a.shape[0]:
            raise ValueError("ids and vectors must have matching length")
        if arr.size == 0:
            return
        if not self.params.allow_removals:
            raise RuntimeError("update requires allow_removals=True")
        if np.unique(arr).size != arr.size:
            raise ValueError("update ids must be unique")
        C = self.shard_capacity
        S = self.n_shards
        bad = (arr < 0) | (arr >= S * C)
        if bad.any():
            raise ValueError("update ids must all be active")
        active = np.asarray(self._state.active)
        if not active[arr % S, arr // S].all():
            raise ValueError("update ids must all be active")
        self.remove(arr)
        self._invalidate_caches()
        # reinsert into the same slots, shard by shard
        lvls = G.sample_levels(self._rng, arr.size,
                               self.params.distribution_rate,
                               self._cfg.max_levels)
        shard_of = arr % S
        slot_of = (arr // S).astype(np.int64)
        for s in range(S):
            freed = {int(x) for x in slot_of[shard_of == s]}
            self._free[s] = [x for x in self._free[s] if x not in freed]
        queues = [list(np.flatnonzero(shard_of == s)) for s in range(S)]
        for s in range(S):
            self._counts[s] += len(queues[s])
            if queues[s] and not self._seeded[s]:
                j = queues[s].pop(0)
                local = G.seed_first_node(
                    self._cfg, self._local(s), int(slot_of[j]), a[j],
                    int(lvls[j]))
                self._set_local(s, local)
                self._seeded[s] = True
                if lvls[j] >= 1:
                    self._upper_set[s].add(int(slot_of[j]))
        self._drain_waves(queues, slot_of, a, lvls)

    # ------------------------------------------------------------------
    # introspection
    # ------------------------------------------------------------------

    @property
    def count(self) -> int:
        """Active items across all shards (host mirror — no device
        readback, see HNSWIndex.count)."""
        return int(self._counts.sum())

    def ids(self) -> np.ndarray:
        """Active global ids, ascending."""
        active = np.asarray(self._state.active)
        s, slot = np.nonzero(active)
        return np.sort(slot.astype(np.int64) * self.n_shards + s) \
            .astype(np.int32)

    def items(self) -> np.ndarray:
        """Active stored vectors, ordered like ids().  Inherently a
        full-corpus readback; above the mirror budget rows are gathered on
        the mesh and transferred in bounded chunks."""
        active = np.asarray(self._state.active)
        s, slot = np.nonzero(active)
        g = slot.astype(np.int64) * self.n_shards + s
        order = np.argsort(g)
        if self._mirrorable():
            return self._host_vecs()[s[order], slot[order]]
        g = g[order]
        chunk = 1 << 16
        out = np.empty((g.size, self.dim), np.float32)
        for i in range(0, g.size, chunk):
            out[i:i + chunk] = self._rows_global(g[i:i + chunk])
        return out

    def get_info(self) -> stats.HNSWInfo:
        """Per-layer degree statistics aggregated over all shards
        (HNSWIndex.cs:192-196 semantics on the union of subgraphs).

        Shard subgraphs are edge-disjoint, so global stats are exactly the
        shard histograms merged on the host: one vmapped stats program and
        one (S, ~4 KB) readback per layer, instead of 3 x S x (C,) arrays
        (which was ~quadratic-ish in mesh size through the relay)."""
        tops = self._ep_tops()
        top = max(tops)
        if top < 0:
            return stats.HNSWInfo(layers=[])
        report_in = self.params.allow_removals
        layers = []
        for l in range(top + 1):
            vecs = np.asarray(stats._layer_hist_sharded(self._state, l))
            # merge: heads combine with sum/max/min (empty shards carry
            # identity sentinels), histograms + overflow sums add
            merged = np.concatenate([
                np.array([vecs[:, 0].sum(), vecs[:, 1].max(),
                          vecs[:, 2].min(), vecs[:, 3].max(),
                          vecs[:, 4].min(), vecs[:, 5].sum()],
                         dtype=np.int64),
                vecs[:, 6:].sum(axis=0, dtype=np.int64)])
            wout = stats._row_width(self._state, l)  # last-dim width only
            st = stats._hist_stats(merged, wout)
            if st is None:
                continue
            if st == "overflow":    # in-median beyond the histogram: exact
                st = self._full_readback_layer_stats(l, tops)
            layers.append(stats._layer_info(l, st, report_in))
        return stats.HNSWInfo(layers=layers)

    def _full_readback_layer_stats(self, l: int, tops: List[int]) -> dict:
        """Exact per-node fallback for the pathological in-degree-median
        overflow case: concatenates per-shard degree readbacks."""
        od_all, id_all = [], []
        for s in range(self.n_shards):
            if tops[s] < 0:
                continue
            outd, ind, on_layer = stats._layer_degrees(
                self._cfg, self._local(s), l)
            on = np.asarray(on_layer)
            od_all.append(np.asarray(outd)[on])
            id_all.append(np.asarray(ind)[on])
        od = np.concatenate(od_all)
        idg = np.concatenate(id_all)

        def med(x):
            sx = np.sort(x)
            m = sx.size
            return int((sx[m // 2 - 1] + sx[m // 2]) // 2) \
                if m % 2 == 0 else int(sx[m // 2])

        return dict(nodes_count=int(od.size),
                    max_out_edges=int(od.max()), min_out_edges=int(od.min()),
                    max_in_edges=int(idg.max()), min_in_edges=int(idg.min()),
                    avg_out_edges=float(od.mean()),
                    avg_in_edges=float(idg.mean()),
                    out_edges_median=med(od), in_edges_median=med(idg))

    def get_connected_component_counts(self) -> List[int]:
        """Per-layer weak-component counts.  Shard subgraphs are disjoint,
        so the global count is the sum of per-shard counts; one vmapped
        label-propagation program per layer covers every shard (empty
        shards report 0 via the nonempty flag)."""
        tops = self._ep_tops()
        top = max(tops)
        if top < 0:
            return []
        out = []
        for l in range(top + 1):
            c, nonempty = stats._components_sharded(
                self._cfg, self._state, l,
                stats.components_iter_bound(self.shard_capacity))
            c = np.asarray(c)
            ne = np.asarray(nonempty)
            # a layer counts for the global list only up to each shard's
            # own top; shards with no nodes at l contribute 0
            out.append(int(c[ne].sum()))
        # trim trailing all-empty layers (per-shard semantics kept: the
        # list length is the max over shards of their top+1)
        return out

    # ------------------------------------------------------------------
    # persistence
    # ------------------------------------------------------------------

    def serialize(self, path: str) -> None:
        """Snapshot the sharded index (all shards) to one .npz."""
        import dataclasses
        import json
        header = {
            "dim": self.dim, "metric": self.metric,
            # gid mapping version: "interleaved" = gid = slot*S + shard
            # (round 4+).  Snapshots written under the earlier
            # shard*C+slot scheme carry no marker and are rejected on
            # load — silently remapping every externally-held gid to a
            # different vector is far worse than refusing.
            "gid_scheme": "interleaved",
            "n_shards": self.n_shards,
            "shard_capacity": self.shard_capacity,
            "max_levels": int(self._cfg.max_levels),
            "parameters": dataclasses.asdict(self.params),
            "lengths": [int(x) for x in self._lengths],
            "counts": [int(x) for x in self._counts],
            "free": [[int(x) for x in f] for f in self._free],
            "seeded": [bool(x) for x in self._seeded],
        }
        arrays = {f: np.asarray(getattr(self._state, f))
                  for f in self._state._fields
                  if f not in ("vlo_store", "coarse")}
        np.savez_compressed(
            path,
            header=np.frombuffer(json.dumps(header).encode(), np.uint8),
            **arrays)

    @classmethod
    def deserialize(cls, path: str,
                    devices: List[jax.Device] | None = None
                    ) -> "ShardedIndex":
        import json

        from ..core.snapshot import npz_path
        with np.load(npz_path(path)) as z:
            header = json.loads(bytes(z["header"]).decode())
            arrays = {f: z[f] for f in z.files if f != "header"}
        scheme = header.get("gid_scheme")
        if scheme != "interleaved":
            raise ValueError(
                "snapshot predates the interleaved gid scheme "
                f"(gid_scheme={scheme!r}); its gids (slot-major) would "
                "silently remap under the current slot*S+shard mapping — "
                "rebuild the index or re-serialize with the writing "
                "version")
        devices = devices or jax.devices()
        S = header["n_shards"]
        if len(devices) < S:
            raise RuntimeError(
                f"snapshot uses {S} shards but only {len(devices)} devices "
                "are available")
        params = HNSWParameters(**header["parameters"])
        idx = cls(header["dim"], header["metric"], params,
                  devices=list(devices)[:S])
        # land on the saved geometry: a snapshot taken after capacity
        # growth carries a larger per-shard capacity than a fresh
        # allocation for the same collection_size (max_levels is fixed at
        # construction and unchanged by growth, so the config stays
        # consistent — see _grow_shards)
        saved_cap = int(header["shard_capacity"])
        assert saved_cap >= idx.shard_capacity, \
            "collection_size/shard geometry mismatch"
        idx.shard_capacity = saved_cap
        assert idx._cfg.max_levels == int(header["max_levels"]), \
            "snapshot max_levels mismatch"
        vecs = jnp.asarray(arrays["vectors"])
        state = idx._state
        lo = jnp.dtype(idx._cfg.rank_dtype)
        use_coarse = state.coarse.size > 0
        new_state = state.__class__(
            vectors=vecs,
            vlo_store=(vecs[:, :0] if lo == jnp.float32 else
                       jnp.asarray(vecs, dtype=lo)),
            coarse=(jnp.asarray(vecs, dtype=jnp.bfloat16) if use_coarse
                    else vecs[:, :0].astype(jnp.bfloat16)),
            norms=jnp.asarray(arrays["norms"]),
            level=jnp.asarray(arrays["level"]),
            nbr0=jnp.asarray(arrays["nbr0"]),
            deg0=jnp.asarray(arrays["deg0"]),
            nbru=jnp.asarray(arrays["nbru"]),
            degu=jnp.asarray(arrays["degu"]),
            active=jnp.asarray(arrays["active"]),
            ep=jnp.asarray(arrays["ep"]),
            count=jnp.asarray(arrays["count"]),
        )
        shspec = jax.tree.map(
            lambda x: NamedSharding(
                idx.mesh, P("shard", *([None] * (x.ndim - 1)))), new_state)
        idx._state = jax.tree.map(jax.device_put, new_state, shspec)
        idx._lengths = np.asarray(header["lengths"], np.int64)
        counts = header.get("counts")
        if counts is None:                     # legacy snapshot
            counts = np.asarray(arrays["count"], np.int64)
        idx._counts = np.asarray(counts, np.int64)
        idx._free = [list(f) for f in header.get(
            "free", [[] for _ in range(S)])]
        idx._seeded = np.asarray(header["seeded"], bool)
        idx._shwm = int(idx._lengths.max()) if S else 0
        # rebuild the per-shard upper panels from the loaded levels (the
        # arrays are host-resident numpy here — no device readback)
        live_up = np.asarray(arrays["active"]) & \
            (np.asarray(arrays["level"]) >= 1)
        idx._upper_set = [set(np.flatnonzero(live_up[s]).tolist())
                          for s in range(S)]
        return idx
