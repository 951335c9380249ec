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

Global ids are ``shard * shard_capacity + local_slot`` so results are
stable across re-sharding of the query side.
"""

from __future__ import annotations

from typing import List

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
from ..core.construct import insert_wave
from ..core.search import knn_search
from ..ops import distance as dst
from ..params import HNSWParameters


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
        local_cap = max(2, -(-p.collection_size // self.n_shards))
        local_cap = 1 << (local_cap - 1).bit_length()
        self.shard_capacity = local_cap
        max_levels = G.default_max_levels(local_cap, p.distribution_rate)
        from ..index import resolve_rank_dtype
        self._cfg = G.GraphConfig(
            dim=self.dim, metric=metric, max_edges=p.max_edges,
            max_levels=max_levels, ef_construction=p.max_candidates,
            search_iter_factor=p.search_iter_factor,
            build_expand=p.build_expand,
            rank_dtype=resolve_rank_dtype(p.rank_dtype))

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
        self._seeded = np.zeros(self.n_shards, dtype=bool)

    # ------------------------------------------------------------------

    def _wave_fn(self, W: int):
        cfg = self._cfg

        def run(st, ids, vecs, lvls, valid):
            local = _squeeze(st)
            out = insert_wave(cfg, local, ids[0], vecs[0], lvls[0], valid[0])
            return _expand(out)

        specs = (jax.tree.map(lambda _: P("shard"), self._state),
                 P("shard"), P("shard"), P("shard"), P("shard"))
        return jax.jit(_shard_map(run, self.mesh, specs,
                                  jax.tree.map(lambda _: P("shard"),
                                               self._state)))

    def add(self, vecs) -> np.ndarray:
        """Round-robin shard assignment + per-shard insert waves run as one
        SPMD program per wave.  Returns global int32 ids."""
        a = np.ascontiguousarray(np.asarray(vecs, np.float32))
        if a.ndim == 1:
            a = a[None]
        n = a.shape[0]
        S = self.n_shards
        C = self.shard_capacity
        lvls_all = G.sample_levels(self._rng, n,
                                   self.params.distribution_rate,
                                   self._cfg.max_levels)
        # round-robin assignment, starting from the least-filled shard
        order = np.argsort(self._lengths, kind="stable")
        shard_of = np.empty(n, dtype=np.int64)
        for j in range(n):
            shard_of[j] = order[j % S]
        slots = np.empty(n, dtype=np.int64)
        for s in range(S):
            mine = np.flatnonzero(shard_of == s)
            slots[mine] = self._lengths[s] + np.arange(mine.size)
            self._lengths[s] += mine.size
            if self._lengths[s] > C:
                raise RuntimeError(
                    "shard capacity exhausted; set a larger collection_size")
        gids = (shard_of * C + slots).astype(np.int32)

        # seed unseeded shards with their first item (host-side scatter)
        for s in range(S):
            if self._seeded[s]:
                continue
            mine = np.flatnonzero(shard_of == s)
            if mine.size == 0:
                continue
            j = mine[0]
            local = _squeeze(jax.tree.map(lambda x: x[s:s + 1], self._state))
            local = G.seed_first_node(self._cfg, local, int(slots[j]),
                                      a[j], int(lvls_all[j]))
            self._state = jax.tree.map(
                lambda full, one: full.at[s].set(one), self._state,
                local)
            self._seeded[s] = True
            shard_of[j] = -1  # consumed

        # per-shard wave queues with the same doubling schedule as the
        # single-chip index: a shard holding b nodes accepts at most b new
        # items per wave, so early waves stay small and graph quality holds.
        queues = [list(np.flatnonzero(shard_of == s)) for s in range(S)]
        built = np.array([max(1, self._lengths[s] - len(queues[s]))
                          for s in range(S)], dtype=np.int64)
        Wmax = max(1, self.params.max_wave_size // S)
        wave_fn = self._wave_fn(Wmax)
        while any(queues):
            ids_w = np.full((S, Wmax), -1, np.int32)
            vec_w = np.zeros((S, Wmax, self.dim), np.float32)
            lvl_w = np.zeros((S, Wmax), np.int32)
            val_w = np.zeros((S, Wmax), bool)
            for s in range(S):
                w = int(min(Wmax, built[s], len(queues[s])))
                take, queues[s] = queues[s][:w], queues[s][w:]
                built[s] += len(take)
                for t, j in enumerate(take):
                    ids_w[s, t] = slots[j]
                    vec_w[s, t] = a[j]
                    lvl_w[s, t] = lvls_all[j]
                    val_w[s, t] = True
            self._state = wave_fn(self._state, jnp.asarray(ids_w),
                                  jnp.asarray(vec_w), jnp.asarray(lvl_w),
                                  jnp.asarray(val_w))
        return gids

    # ------------------------------------------------------------------

    def _query_fn(self, ef: int, max_iters: int):
        cfg = self._cfg
        C = self.shard_capacity

        expand = max(1, self.params.query_expand)

        def run(st, q):
            local = _squeeze(st)
            d, i = knn_search(cfg, local, q, 0, ef, max_iters,
                              expand=expand)
            base = lax.axis_index("shard").astype(jnp.int32) * C
            gi = jnp.where(i >= 0, i + base, -1)
            return d[None], gi[None]

        specs = (jax.tree.map(lambda _: P("shard"), self._state), P())
        shmapped = _shard_map(run, self.mesh, specs,
                              (P("shard"), P("shard")))

        @jax.jit
        def query(st, q):
            d, gi = shmapped(st, q)          # (S, B, ef) each
            B = q.shape[0]
            dd = jnp.swapaxes(d, 0, 1).reshape(B, -1)
            ii = jnp.swapaxes(gi, 0, 1).reshape(B, -1)
            sd, si = lax.sort((dd, ii), num_keys=1)  # ICI all-gather + merge
            return sd[:, :ef], si[:, :ef]

        return query

    def _exact_query_fn(self, k: int):
        cfg = self._cfg
        C = self.shard_capacity
        from ..ops.bruteforce import exact_knn

        def run(st, q):
            local = _squeeze(st)
            d, i = exact_knn(cfg.metric, local.vectors, local.norms,
                             local.active, q, k)
            base = lax.axis_index("shard").astype(jnp.int32) * C
            gi = jnp.where(i >= 0, i + base, -1)
            return d[None], gi[None]

        specs = (jax.tree.map(lambda _: P("shard"), self._state), P())
        shmapped = _shard_map(run, self.mesh, specs,
                              (P("shard"), P("shard")))

        @jax.jit
        def query(st, q):
            d, gi = shmapped(st, q)          # (S, B, k) each
            B = q.shape[0]
            dd = jnp.swapaxes(d, 0, 1).reshape(B, -1)
            ii = jnp.swapaxes(gi, 0, 1).reshape(B, -1)
            order = jnp.argsort(dd, axis=1)[:, :k]
            return (jnp.take_along_axis(dd, order, axis=1),
                    jnp.take_along_axis(ii, order, axis=1))

        return query

    def knn_query(self, queries, k: int, exact: bool = False):
        """Fan-out batched k-NN: per-shard beams (or per-shard exact MXU
        scoring with ``exact=True``) + global top-k merge over ICI."""
        q = np.ascontiguousarray(np.asarray(queries, np.float32))
        if q.ndim == 1:
            q = q[None]
        if exact:
            fn = self._exact_query_fn(k)
        else:
            ef = max(self.params.min_nn, k)
            max_iters = (self._cfg.search_iter_factor * ef) \
                // max(1, self.params.query_expand) + 16
            fn = self._query_fn(ef, max_iters)
        d, i = fn(self._state, jnp.asarray(q))
        d = np.asarray(d)[:, :k]
        i = np.asarray(i)[:, :k]
        d = np.where(i >= 0, d, np.nan).astype(np.float32)
        return i.astype(np.int32), d

    def remove(self, gids) -> None:
        """Remove by global id with per-shard graph repair.

        Shard subgraphs are independent, so removal routes each id to its
        owning shard (gid // shard_capacity) and runs the standard repair
        driver on that shard's slice.  Freed slots are not currently
        recycled by the sharded allocator (append-only slots per shard).
        """
        if not self.params.allow_removals:
            raise RuntimeError("Removals are disabled in this index "
                               "instance.")
        from ..core.remove import remove_from_state
        arr = np.asarray(gids, dtype=np.int64).ravel()
        if arr.size == 0:
            return
        C = self.shard_capacity
        shard_of = arr // C
        local_of = (arr % C).astype(np.int32)
        for s in np.unique(shard_of):
            mine = local_of[shard_of == s]
            local = _squeeze(jax.tree.map(
                lambda x: x[int(s):int(s) + 1], self._state))
            local = remove_from_state(
                self._cfg, local, mine,
                self.params.remove_max_candidates)
            self._state = jax.tree.map(
                lambda full, one: full.at[int(s)].set(one), self._state,
                local)

    @property
    def count(self) -> int:
        return int(np.asarray(jnp.sum(self._state.count)))

    # ------------------------------------------------------------------

    def serialize(self, path: str) -> None:
        """Snapshot the sharded index (all shards) to one .npz."""
        import dataclasses
        import json
        header = {
            "dim": self.dim, "metric": self.metric,
            "n_shards": self.n_shards,
            "shard_capacity": self.shard_capacity,
            "max_levels": int(self._cfg.max_levels),
            "parameters": dataclasses.asdict(self.params),
            "lengths": [int(x) for x in self._lengths],
            "seeded": [bool(x) for x in self._seeded],
        }
        arrays = {f: np.asarray(getattr(self._state, f))
                  for f in self._state._fields if f != "vlo"}
        np.savez_compressed(
            path,
            header=np.frombuffer(json.dumps(header).encode(), np.uint8),
            **arrays)

    @classmethod
    def deserialize(cls, path: str,
                    devices: List[jax.Device] | None = None
                    ) -> "ShardedIndex":
        import json
        with np.load(path) as z:
            header = json.loads(bytes(z["header"]).decode())
            arrays = {f: z[f] for f in z.files if f != "header"}
        devices = devices or jax.devices()
        S = header["n_shards"]
        if len(devices) < S:
            raise RuntimeError(
                f"snapshot uses {S} shards but only {len(devices)} devices "
                "are available")
        params = HNSWParameters(**header["parameters"])
        idx = cls(header["dim"], header["metric"], params,
                  devices=list(devices)[:S])
        # deserialize must land on the saved geometry
        assert idx.shard_capacity == header["shard_capacity"], \
            "collection_size/shard geometry mismatch"
        vecs = jnp.asarray(arrays["vectors"])
        state = idx._state
        new_state = state.__class__(
            vectors=vecs,
            vlo=jnp.array(vecs, dtype=state.vlo.dtype, copy=True),
            norms=jnp.asarray(arrays["norms"]),
            level=jnp.asarray(arrays["level"]),
            nbr=jnp.asarray(arrays["nbr"]),
            deg=jnp.asarray(arrays["deg"]),
            active=jnp.asarray(arrays["active"]),
            ep=jnp.asarray(arrays["ep"]),
            count=jnp.asarray(arrays["count"]),
        )
        shspec = jax.tree.map(
            lambda x: NamedSharding(
                idx.mesh, P("shard", *([None] * (x.ndim - 1)))), new_state)
        idx._state = jax.tree.map(jax.device_put, new_state, shspec)
        idx._lengths = np.asarray(header["lengths"], np.int64)
        idx._seeded = np.asarray(header["seeded"], bool)
        return idx
