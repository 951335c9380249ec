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
        NB = blk_ids.shape[0]
        # pad the global block list to a multiple of S with empty blocks
        # so every shard owns the same local count (static shapes)
        NBp = -(-NB // S) * S
        if NBp != NB:
            blk_ids = np.concatenate(
                [blk_ids, np.full((NBp - NB, BS), -1, np.int32)])
            blk_vecs = np.concatenate(
                [blk_vecs, np.zeros((NBp - NB, BS, self.dim), np.float32)])
        fill = (blk_ids >= 0).sum(axis=1).astype(np.int32)
        cents = blk_vecs.sum(axis=1) / np.maximum(fill, 1)[:, None]

        # shard ownership: global block gb -> (shard gb % S, row gb // S)
        NBs = NBp // S
        deal = np.arange(NBp).reshape(NBs, S).T        # (S, NBs) global ids
        shspec = NamedSharding(self.mesh, P("shard"))
        self._blk_vecs = jax.device_put(
            jnp.asarray(blk_vecs[deal]), shspec)       # (S, NBs, BS, D)
        self._blk_ids = jax.device_put(
            jnp.asarray(blk_ids[deal]), shspec)        # (S, NBs, BS)
        self._blk_fill = jax.device_put(jnp.asarray(fill[deal]), shspec)
        # norm cache on host (numpy) — staging the whole block table
        # through one device just to compute norms would transiently hold
        # the full corpus on a single chip
        ssq = np.einsum("nbd,nbd->nb", blk_vecs, blk_vecs)
        if self.metric == "sq_euclid":
            bn = ssq
        elif self.metric == "cosine":
            bn = np.sqrt(ssq)
        else:
            bn = np.zeros_like(ssq)
        bn = np.where(blk_ids >= 0, bn, 0.0).astype(np.float32)
        self._blk_norms = jax.device_put(jnp.asarray(bn[deal]), shspec)
        # replicated router tables — REAL blocks only: a padding block's
        # zero centroid can otherwise win a probe slot (its distance is
        # mid-range for the cosine family), wasting one of n_probe probes
        self._cents = jnp.asarray(cents[:NB].astype(np.float32))
        self._cent_norms = dst.norm_data(self.metric, self._cents)
        self.n_blocks = NB
        self.count = N
        # host copy for float64 refinement (global ids are corpus rows)
        self._host_vecs = vecs
        self._built = True

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
        np.savez_compressed(
            path,
            header=np.frombuffer(json.dumps(header).encode(), np.uint8),
            vectors=self._host_vecs)

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
        p = HNSWParameters(random_seed=header.get("random_seed", 31337))
        ix = cls(header["dim"], header["metric"], parameters=p,
                 block_size=header["block_size"],
                 kmeans_iters=header.get("kmeans_iters", 6),
                 devices=devices)
        ix.build(vecs)
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
            def query(bv, bi, bn, cents, cnorms, q):
                gbids = _route_exact(metric, cents, cnorms, q, n_probe)
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
                  self._cents, self._cent_norms, jnp.asarray(q))
        return self._refine(q, np.asarray(i), k)

    def _refine(self, q: np.ndarray, ids: np.ndarray, k: int):
        """float64 re-rank of returned pairs against the host corpus."""
        from ..utils.refine import refine_pairs
        cand = self._host_vecs[np.clip(ids, 0, self.count - 1)]
        return refine_pairs(self.metric, q, ids, cand, k)
