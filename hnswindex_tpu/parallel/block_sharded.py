"""ShardedBlockIndex — the block-serving engine over a device mesh.

Completes the serving-mode ladder (block.py module docstring): ``exact``
below ~1M rows, ``BlockIndex`` to one chip's HBM, **per-shard BlockIndex
over a mesh** beyond that.  The reference has no distributed layer at all
(SURVEY.md §2); this is the designed TPU-native scale-out of its query
path (HNSWIndex.cs:107-137) for bulk-built corpora.

Design:

* blocks are laid out exactly as in ``BlockIndex`` (global k-means +
  per-cluster chunking, block.py::_layout_blocks), then dealt round-robin
  to shards: global block ``gb`` lives on shard ``gb % S`` at local row
  ``gb // S`` — the (NB, BS, D) block table becomes an (S, NBs, BS, D)
  mesh-sharded array;
* the centroid table is small (NB x D: ~45 MB at 8M rows) and stays
  replicated, so routing — one MXU matmul + top-``n_probe`` — runs
  identically on every shard with zero communication;
* each shard masks the global probe list to the blocks it owns, fetches
  and scores them exactly (the same contiguous-block MXU path as the
  single-chip index), and the per-shard top-k lists merge into a global
  top-k — one all-gather over ICI per query batch.

Total scored blocks per query is exactly ``n_probe`` — identical work to
the single-chip index, split ~evenly across shards (round-robin dealing
decorrelates block locality from ownership), so per-chip latency scales
as n_probe/S while recall is bit-identical to single-chip routing.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..block import _layout_blocks, _route_exact, _score_blocks
from ..ops import distance as dst
from ..params import HNSWParameters
from .sharded import _shard_map


class ShardedBlockIndex:
    """Bulk-built block index sharded across ``devices`` (see module
    docstring).  Same query contract as BlockIndex: ``knn_query(q, k,
    n_probe)`` -> (ids, dists) -1/NaN padded, float64-refined."""

    def __init__(self, dim: int, metric: str = "sq_euclid",
                 parameters: Optional[HNSWParameters] = None,
                 block_size: int = 128, kmeans_iters: int = 6,
                 devices: List[jax.Device] | None = None):
        dst.check_metric(metric)
        if dst.is_custom(metric):
            raise ValueError(
                "ShardedBlockIndex requires a dot-decomposable metric")
        self.dim = int(dim)
        self.metric = metric
        self.params = parameters or HNSWParameters()
        self.block_size = int(block_size)
        self.kmeans_iters = int(kmeans_iters)
        devices = devices or jax.devices()
        self.n_shards = len(devices)
        self.mesh = Mesh(np.asarray(devices), axis_names=("shard",))
        self._fns = {}
        self._built = False

    # -- build -------------------------------------------------------------

    def build(self, vectors) -> None:
        """Bulk build: global clustering, round-robin block dealing, one
        device_put per sharded table."""
        vecs = np.ascontiguousarray(np.asarray(vectors, np.float32))
        if vecs.ndim != 2 or vecs.shape[1] != self.dim:
            raise ValueError(f"expected (n, {self.dim}) vectors")
        N = vecs.shape[0]
        BS = self.block_size
        S = self.n_shards
        seed = (self.params.random_seed if self.params.random_seed >= 0
                else None)
        rng = np.random.default_rng(seed)

        blk_ids, blk_vecs = _layout_blocks(vecs, BS, self.kmeans_iters, rng)
        self._install(blk_ids, blk_vecs, vecs)

    def _host_norms(self, blk_ids: np.ndarray, blk_vecs: np.ndarray
                    ) -> np.ndarray:
        """Metric norm cache on host (numpy) — staging the whole block
        table through one device just to compute norms would transiently
        hold the full corpus on a single chip."""
        ssq = np.einsum("nbd,nbd->nb", blk_vecs, blk_vecs)
        if self.metric == "sq_euclid":
            bn = ssq
        elif self.metric == "cosine":
            bn = np.sqrt(ssq)
        else:
            bn = np.zeros_like(ssq)
        return np.where(blk_ids >= 0, bn, 0.0).astype(np.float32)

    def _install(self, blk_ids: np.ndarray, blk_vecs: np.ndarray,
                 vecs: np.ndarray) -> None:
        """Set host mirrors + mesh-sharded device tables from a global
        block layout (shared by build and rebuild)."""
        S = self.n_shards
        BS = self.block_size
        NB = blk_ids.shape[0]
        # pad the global block list to a multiple of S with empty blocks
        # so every shard owns the same local count (static shapes)
        NBp = -(-NB // S) * S
        if NBp != NB:
            blk_ids = np.concatenate(
                [blk_ids, np.full((NBp - NB, BS), -1, np.int32)])
            blk_vecs = np.concatenate(
                [blk_vecs, np.zeros((NBp - NB, BS, self.dim), np.float32)])
        self._h_ids = np.ascontiguousarray(blk_ids, np.int32)
        self._h_vecs = np.ascontiguousarray(blk_vecs, np.float32)
        self._h_fill = (blk_ids >= 0).sum(axis=1).astype(np.int32)
        self._h_cents = (blk_vecs.sum(axis=1)
                         / np.maximum(self._h_fill, 1)[:, None]
                         ).astype(np.float32)
        # per-block mean squared member->centroid distance — the dynamic
        # add path's membership-consistency radius (BlockIndex._place_one)
        sq = ((blk_vecs - self._h_cents[:, None, :]) ** 2).sum(axis=2)
        self._h_r2 = (np.where(blk_ids >= 0, sq, 0.0).sum(axis=1)
                      / np.maximum(self._h_fill, 1)).astype(np.float32)
        fill = self._h_fill
        cents = self._h_cents

        # shard ownership: global block gb -> (shard gb % S, row gb // S)
        NBs = NBp // S
        deal = np.arange(NBp).reshape(NBs, S).T        # (S, NBs) global ids
        shspec = NamedSharding(self.mesh, P("shard"))
        self._blk_vecs = jax.device_put(
            jnp.asarray(blk_vecs[deal]), shspec)       # (S, NBs, BS, D)
        self._blk_ids = jax.device_put(
            jnp.asarray(blk_ids[deal]), shspec)        # (S, NBs, BS)
        self._blk_fill = jax.device_put(jnp.asarray(fill[deal]), shspec)
        bn = self._host_norms(blk_ids, blk_vecs)
        self._blk_norms = jax.device_put(jnp.asarray(bn[deal]), shspec)
        # replicated router tables; empty blocks (padding / growth
        # headroom) are masked out of routing via _cent_valid
        self._cents = jnp.asarray(cents)
        self._cent_norms = dst.norm_data(self.metric, self._cents)
        self._cent_valid = jnp.asarray(fill > 0)
        self.n_blocks = NBp
        # global ids are corpus rows; removals tombstone _live only
        self._live = np.zeros(vecs.shape[0], dtype=bool)
        flat = blk_ids.reshape(-1)
        self._live[flat[flat >= 0]] = True
        self.count = int(self._live.sum())
        self._built_count = max(1, self.count)
        # host copy for float64 refinement (global ids are corpus rows)
        self._host_vecs = np.ascontiguousarray(vecs, np.float32)
        self._id_to_blk = np.full(vecs.shape[0], -1, np.int64)
        rows, slots = np.nonzero(blk_ids >= 0)
        self._id_to_blk[blk_ids[rows, slots]] = rows * BS + slots
        self._open_dyn: list = []       # blocks opened by dynamic overflow
        self._built = True

    # -- dynamics ------------------------------------------------------------
    #
    # Same minimal-churn contract as BlockIndex (block.py "dynamics"
    # section): appends into the nearest block with space (fresh blocks
    # when full), swap-compacted removals, in-place updates.  Host
    # mirrors hold the truth; only touched (shard, row) block slices are
    # re-uploaded to the mesh.  needs_rebuild()/rebuild() handle layout
    # degradation under sustained churn.

    def _push_touched(self, gbs) -> None:
        """Upload touched global blocks to their (shard, row) slots."""
        tb = np.unique(np.asarray(gbs, np.int64))
        if tb.size == 0:
            return
        S = self.n_shards
        sh = jnp.asarray(tb % S)
        rw = jnp.asarray(tb // S)
        ids_t = self._h_ids[tb]
        vec_t = self._h_vecs[tb]
        self._blk_vecs = self._blk_vecs.at[sh, rw].set(jnp.asarray(vec_t))
        self._blk_ids = self._blk_ids.at[sh, rw].set(jnp.asarray(ids_t))
        self._blk_fill = self._blk_fill.at[sh, rw].set(
            jnp.asarray(self._h_fill[tb]))
        self._blk_norms = self._blk_norms.at[sh, rw].set(
            jnp.asarray(self._host_norms(ids_t, vec_t)))
        self._cents = self._cents.at[jnp.asarray(tb)].set(
            jnp.asarray(self._h_cents[tb]))
        self._cent_norms = dst.norm_data(self.metric, self._cents)
        self._cent_valid = jnp.asarray(self._h_fill > 0)

    def _grow_blocks(self, n_new: int) -> None:
        """Extend every shard's block table by the same local row count
        (global count grows by a multiple of S; slack bounds recompiles)."""
        S = self.n_shards
        BS = self.block_size
        NBp = self._h_ids.shape[0]
        grow_rows = -(-max(n_new, 16, NBp // 4) // S)     # per-shard rows
        extra = grow_rows * S
        self._h_ids = np.concatenate(
            [self._h_ids, np.full((extra, BS), -1, np.int32)])
        self._h_vecs = np.concatenate(
            [self._h_vecs, np.zeros((extra, BS, self.dim), np.float32)])
        self._h_fill = np.concatenate(
            [self._h_fill, np.zeros(extra, np.int32)])
        self._h_cents = np.concatenate(
            [self._h_cents, np.zeros((extra, self.dim), np.float32)])
        self._h_r2 = np.concatenate(
            [self._h_r2, np.zeros(extra, np.float32)])
        # IMPORTANT: the deal maps gb -> (gb % S, gb // S); appending
        # rows at the END of each shard's local table keeps every
        # existing gb at the same (shard, row) only because the new
        # global ids start at NBp (old: gb // S < old NBs)
        zv = jnp.zeros((S, grow_rows, BS, self.dim), jnp.float32)
        zi = jnp.full((S, grow_rows, BS), -1, jnp.int32)
        zf = jnp.zeros((S, grow_rows), jnp.int32)
        zn = jnp.zeros((S, grow_rows, BS), jnp.float32)
        shspec = NamedSharding(self.mesh, P("shard"))
        self._blk_vecs = jax.device_put(
            jnp.concatenate([self._blk_vecs, zv], axis=1), shspec)
        self._blk_ids = jax.device_put(
            jnp.concatenate([self._blk_ids, zi], axis=1), shspec)
        self._blk_fill = jax.device_put(
            jnp.concatenate([self._blk_fill, zf], axis=1), shspec)
        self._blk_norms = jax.device_put(
            jnp.concatenate([self._blk_norms, zn], axis=1), shspec)
        self._cents = jnp.concatenate(
            [self._cents, jnp.zeros((extra, self.dim), jnp.float32)])
        self._cent_norms = dst.norm_data(self.metric, self._cents)
        self._cent_valid = jnp.asarray(self._h_fill > 0)
        self.n_blocks = self._h_ids.shape[0]

    def _refresh_cent(self, b: int) -> None:
        f = int(self._h_fill[b])
        if f:
            c = self._h_vecs[b, :f].mean(axis=0)
            self._h_cents[b] = c
            self._h_r2[b] = ((self._h_vecs[b, :f] - c) ** 2).sum(1).mean()
        else:
            self._h_cents[b] = 0.0
            self._h_r2[b] = 0.0

    def _route_pref(self, a: np.ndarray) -> np.ndarray:
        npb = min(8, self.n_blocks)
        return np.asarray(_route_exact(
            self.metric, self._cents, self._cent_norms, jnp.asarray(a),
            npb, self._cent_valid))

    def _place_batch(self, gids: np.ndarray, a: np.ndarray,
                     pref: np.ndarray) -> list:
        """Batch placement with BlockIndex's rules (membership radius,
        open-block sharing, fresh-block fallback) — shared implementation,
        see block.place_batch."""
        from ..block import place_batch
        return place_batch(self, self._id_to_blk, gids, a, pref)

    def _evict_one(self, gid: int) -> int:
        """Swap-compact one id out of its block; returns the block."""
        BS = self.block_size
        pos = self._id_to_blk[gid]
        b, s = int(pos // BS), int(pos % BS)
        last = int(self._h_fill[b]) - 1
        if s != last:
            mv = int(self._h_ids[b, last])
            self._h_ids[b, s] = mv
            self._h_vecs[b, s] = self._h_vecs[b, last]
            self._id_to_blk[mv] = b * BS + s
        self._h_ids[b, last] = -1
        self._h_vecs[b, last] = 0.0
        self._h_fill[b] = last
        self._id_to_blk[gid] = -1
        self._refresh_cent(b)
        return b

    def add(self, vectors) -> np.ndarray:
        """Append vectors (global ids = corpus rows, monotone)."""
        if not self._built:
            raise RuntimeError("ShardedBlockIndex.build() must be called "
                               "first")
        a = np.ascontiguousarray(np.asarray(vectors, np.float32))
        if a.ndim == 1:
            a = a[None]
        if a.shape[1] != self.dim:
            raise ValueError(f"expected dim={self.dim}, got {a.shape[1]}")
        m = a.shape[0]
        if m == 0:
            return np.empty(0, np.int32)
        new_ids = self._host_vecs.shape[0] + np.arange(m, dtype=np.int64)
        self._host_vecs = np.concatenate([self._host_vecs, a])
        self._live = np.concatenate([self._live, np.ones(m, bool)])
        self._id_to_blk = np.concatenate(
            [self._id_to_blk, np.full(m, -1, np.int64)])
        pref = self._route_pref(a)
        touched = self._place_batch(new_ids, a, pref)
        self._push_touched(touched)
        self.count += m
        return new_ids.astype(np.int32)

    def remove(self, ids) -> None:
        """Remove by id: swap-compact within each touched block."""
        if not self._built:
            raise RuntimeError("ShardedBlockIndex.build() must be called "
                               "first")
        arr = np.unique(np.asarray(ids, np.int64).ravel())
        arr = arr[(arr >= 0) & (arr < self._id_to_blk.size)]
        arr = arr[self._id_to_blk[arr] >= 0]
        if arr.size == 0:
            return
        touched = []
        for g in arr:
            touched.append(self._evict_one(int(g)))
            self._live[g] = False
        self._push_touched(touched)
        self.count -= arr.size

    def update(self, ids, vectors) -> None:
        """Replace stored vectors keeping their ids.  Re-routes each
        updated vector to its new nearest block (evict + place — see
        BlockIndex.update: in-place rewrites strand far-moved vectors in
        blocks whose centroid no longer represents them)."""
        arr = np.asarray(ids, np.int64).ravel()
        a = np.ascontiguousarray(np.asarray(vectors, np.float32))
        if a.ndim == 1:
            a = a[None]
        if arr.size != a.shape[0]:
            raise ValueError("ids and vectors must have matching length")
        bad = (arr < 0) | (arr >= self._id_to_blk.size)
        if bad.any() or (self._id_to_blk[arr] < 0).any():
            raise ValueError("update ids must all be active")
        self._host_vecs[arr] = a
        pref = self._route_pref(a)
        # evict the whole batch, then place it (remove + reinsert
        # semantics — see BlockIndex.update)
        touched = [self._evict_one(g) for g in arr.tolist()]
        touched += self._place_batch(arr, a, pref)
        self._push_touched(touched)

    def needs_rebuild(self) -> bool:
        """Layout-degradation trigger (see BlockIndex.needs_rebuild)."""
        live_blocks = int((self._h_fill > 0).sum())
        avg_fill = self.count / max(1, live_blocks * self.block_size)
        drift = self.count / self._built_count
        return drift > 2.0 or drift < 0.5 or avg_fill < 0.4

    def rebuild(self) -> None:
        """Full re-layout of the live members (ids preserved)."""
        live = np.flatnonzero(self._live)
        vecs = self._host_vecs
        seed = (self.params.random_seed if self.params.random_seed >= 0
                else None)
        rng = np.random.default_rng(seed)
        bi, bv = _layout_blocks(vecs[live], self.block_size,
                                self.kmeans_iters, rng)
        keep = bi >= 0
        bi = np.where(keep, live[np.clip(bi, 0, live.size - 1)].astype(
            np.int64), -1).astype(np.int32)
        self._install(bi, bv, vecs)
        # _install derives _live from the block members — correct here
        # because every live member is in the new layout

    # -- persistence ---------------------------------------------------------

    def serialize(self, path: str) -> None:
        if not self._built:
            raise RuntimeError("nothing to serialize: build() first")
        import json
        header = {"dim": self.dim, "metric": self.metric,
                  "block_size": self.block_size, "count": int(self.count),
                  "n_blocks": int(self.n_blocks),
                  "random_seed": int(self.params.random_seed),
                  "kmeans_iters": int(self.kmeans_iters)}
        # the block layout is persisted explicitly (ids only — member
        # vectors reconstruct from the corpus), so an index mutated since
        # build() reloads exactly; blk vectors are NOT duplicated
        np.savez_compressed(
            path,
            header=np.frombuffer(json.dumps(header).encode(), np.uint8),
            vectors=self._host_vecs,
            blk_ids=self._h_ids)

    @classmethod
    def deserialize(cls, path: str,
                    devices: List[jax.Device] | None = None
                    ) -> "ShardedBlockIndex":
        """Rebuild from the stored corpus (the layout is cheap to recompute
        relative to shipping the block tables; same geometry guaranteed by
        the stored seed-free deterministic layout inputs)."""
        import json

        from ..core.snapshot import npz_path
        with np.load(npz_path(path)) as z:
            header = json.loads(bytes(z["header"]).decode())
            vecs = z["vectors"]
            blk_ids = z["blk_ids"] if "blk_ids" in z.files else None
        p = HNSWParameters(random_seed=header.get("random_seed", 31337))
        ix = cls(header["dim"], header["metric"], parameters=p,
                 block_size=header["block_size"],
                 kmeans_iters=header.get("kmeans_iters", 6),
                 devices=devices)
        if blk_ids is None:              # legacy snapshot: re-layout
            ix.build(vecs)
            return ix
        safe = np.clip(blk_ids, 0, max(0, vecs.shape[0] - 1))
        blk_vecs = np.where((blk_ids >= 0)[:, :, None], vecs[safe], 0.0)
        ix._install(blk_ids, blk_vecs.astype(np.float32), vecs)
        return ix

    # -- query ---------------------------------------------------------------

    def _query_fn(self, k: int, n_probe: int):
        metric = self.metric
        S = self.n_shards

        def build():
            def run(bv, bi, bn, q, gbids):
                bv, bi, bn = (x[0] for x in (bv, bi, bn))
                gb = gbids                                  # (B, P) global
                sidx = lax.axis_index("shard").astype(jnp.int32)
                mine = (gb >= 0) & (gb % S == sidx)
                local = jnp.where(mine, gb // S, -1)
                d, ids = _score_blocks(metric, bv, bi, bn, q, local, k)
                return d[None], ids[None]

            specs = (P("shard"), P("shard"), P("shard"), P(), P())
            shmapped = _shard_map(run, self.mesh, specs,
                                  (P("shard"), P("shard")))

            @jax.jit
            def query(bv, bi, bn, cents, cnorms, cvalid, q):
                gbids = _route_exact(metric, cents, cnorms, q, n_probe,
                                     cvalid)
                d, gi = shmapped(bv, bi, bn, q, gbids)
                B = q.shape[0]
                dd = jnp.swapaxes(d, 0, 1).reshape(B, -1)
                ii = jnp.swapaxes(gi, 0, 1).reshape(B, -1)
                order = jnp.argsort(dd, axis=1)  # argsort+take: multi-
                # operand lax.sort is ~30x slower on TPU
                sd = jnp.take_along_axis(dd, order, axis=1)
                si = jnp.take_along_axis(ii, order, axis=1)
                kk = min(k, sd.shape[1])
                return sd[:, :kk], si[:, :kk]

            return query
        fn = self._fns.get(("q", k, n_probe))
        if fn is None:
            fn = self._fns[("q", k, n_probe)] = build()
        return fn

    def knn_query(self, queries, k: int, n_probe: int = 32
                  ) -> Tuple[np.ndarray, np.ndarray]:
        if not self._built:
            raise RuntimeError("ShardedBlockIndex.build() must be called "
                               "first")
        q = np.ascontiguousarray(np.asarray(queries, np.float32))
        if q.ndim == 1:
            q = q[None]
        n_probe = min(n_probe, self.n_blocks)
        fn = self._query_fn(k, n_probe)
        d, i = fn(self._blk_vecs, self._blk_ids, self._blk_norms,
                  self._cents, self._cent_norms, self._cent_valid,
                  jnp.asarray(q))
        return self._refine(q, np.asarray(i), k)

    def _refine(self, q: np.ndarray, ids: np.ndarray, k: int):
        """float64 re-rank of returned pairs against the host corpus."""
        from ..utils.refine import refine_pairs
        cand = self._host_vecs[
            np.clip(ids, 0, self._host_vecs.shape[0] - 1)]
        return refine_pairs(self.metric, q, ids, cand, k)
