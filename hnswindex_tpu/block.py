"""BlockIndex — two-level TPU-native serving index.

The HNSW graph's pointer-chasing beam is bandwidth-hostile on TPU: every
expansion is a random 512-byte row fetch, and XLA's row gather runs far
below HBM speed.  The TPU-first architecture for large-corpus serving is
to make the unit of traversal a *block* of vectors laid out contiguously:

* the corpus is clustered (balanced mini-k-means) into blocks of
  ``block_size`` (default 128 — one MXU tile) stored contiguously as a
  ``(NB, BS, D)`` array;
* a query is *routed* to its ``n_probe`` closest blocks by centroid
  distance — either exactly (one small matmul; centroids number ~N/100)
  or through a centroid-level HNSW graph built with this framework's own
  engine (``router="hnsw"``, for corpora where even the centroid table is
  large);
* the probed blocks are scored *exactly* on the MXU: fetching a block is
  one contiguous 64 KB read instead of 128 scattered row reads, so
  scoring runs near HBM speed instead of gather speed.

This is the serving-mode ladder: ``exact`` (flat MXU scan) below ~1M,
``BlockIndex`` above it, per-shard ``BlockIndex`` over a mesh beyond a
single chip.  Recall is controlled by ``n_probe`` exactly like efSearch
controls the graph beam.

Static-build (bulk) in this version; dynamic adds go to the HNSW index —
the two are complementary, not exclusive.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .ops import distance as dst
from .params import HNSWParameters

_ASSIGN_CHUNK = 8192


@partial(jax.jit, static_argnames=("iters", "chunk"))
def _kmeans_device(vecs, cents0, iters: int, chunk: int):
    """Mini k-means entirely on device: chunked Lloyd assignments (bounded
    (chunk, NC) score transients) + scatter-add centroid updates.  One
    dispatch for the whole run — host syncs in the assignment loop were
    the dominant cost of block builds on remote runtimes."""
    N, D = vecs.shape
    NC = cents0.shape[0]
    vn = jnp.sum(vecs * vecs, axis=1)
    n_chunks = -(-N // chunk)
    pad = n_chunks * chunk - N
    vp = jnp.pad(vecs, ((0, pad), (0, 0)))
    vnp_ = jnp.pad(vn, (0, pad), constant_values=jnp.inf)

    def one_iter(carry, _):
        cents, _prev_labels = carry
        cn = jnp.sum(cents * cents, axis=1)

        def assign_chunk(s, carry):
            labels, sums, counts = carry
            vc = lax.dynamic_slice_in_dim(vp, s * chunk, chunk)
            vnc = lax.dynamic_slice_in_dim(vnp_, s * chunk, chunk)
            dots = jnp.einsum("nd,cd->nc", vc, cents,
                              precision=dst.DOT_PRECISION,
                              preferred_element_type=jnp.float32)
            d = vnc[:, None] + cn[None, :] - 2.0 * dots
            lab = jnp.argmin(d, axis=1).astype(jnp.int32)
            valid = jnp.isfinite(vnc)
            labx = jnp.where(valid, lab, NC)
            labels = lax.dynamic_update_slice_in_dim(labels, lab, s * chunk,
                                                     axis=0)
            sums = sums.at[labx].add(jnp.where(valid[:, None], vc, 0.0),
                                     mode="drop")
            counts = counts.at[labx].add(valid.astype(jnp.float32),
                                         mode="drop")
            return labels, sums, counts

        sums0 = jnp.zeros((NC, D), jnp.float32)
        counts0 = jnp.zeros((NC,), jnp.float32)
        labels, sums, counts = lax.fori_loop(
            0, n_chunks, assign_chunk, (_prev_labels, sums0, counts0))
        new_cents = jnp.where(counts[:, None] > 0,
                              sums / jnp.maximum(counts[:, None], 1.0),
                              cents)
        return (new_cents, labels), None

    # labels ride the carry (only the final assignment is needed) — stacking
    # per-iteration label history would burn iters*(N,) i32 of HBM.
    labels0 = jnp.zeros((n_chunks * chunk,), jnp.int32)
    (_, labels), _ = lax.scan(one_iter, (cents0, labels0), None,
                              length=iters)
    return labels[:N]


def _kmeans(vecs: np.ndarray, n_clusters: int, iters: int,
            rng: np.random.Generator) -> np.ndarray:
    """Mini k-means; returns (N,) labels."""
    N, D = vecs.shape
    idx0 = rng.choice(N, n_clusters, replace=False)
    labels = _kmeans_device(jnp.asarray(vecs), jnp.asarray(vecs[idx0]),
                            iters, min(_ASSIGN_CHUNK, max(N, 8)))
    return np.asarray(labels)


def _layout_blocks(vecs: np.ndarray, BS: int, kmeans_iters: int,
                   rng: np.random.Generator):
    """Cluster + chunk the corpus into contiguous blocks of <= BS members.

    Returns ``(blk_ids (NB, BS) i32 -1-padded, blk_vecs (NB, BS, D) f32)``
    — the shared layout step of BlockIndex and ShardedBlockIndex.
    Targets ~75% average block fill so cluster-size jitter rarely splits
    blocks."""
    N, D = vecs.shape
    n_clusters = max(1, int(np.ceil(N / (0.75 * BS))))
    labels = _kmeans(vecs, n_clusters, kmeans_iters, rng) \
        if n_clusters > 1 else np.zeros(N, np.int32)

    order = np.argsort(labels, kind="stable")
    blocks = []
    sorted_labels = labels[order]
    boundaries = np.flatnonzero(np.diff(sorted_labels)) + 1
    for seg in np.split(order, boundaries):
        for s in range(0, seg.size, BS):
            blocks.append(seg[s:s + BS])
    NB = len(blocks)

    blk_ids = np.full((NB, BS), -1, np.int32)
    blk_vecs = np.zeros((NB, BS, D), np.float32)
    for b, members in enumerate(blocks):
        blk_ids[b, :members.size] = members
        blk_vecs[b, :members.size] = vecs[members]
    return blk_ids, blk_vecs


class BlockIndex:
    """Two-level block-scored index (see module docstring)."""

    def __init__(self, dim: int, metric: str = "sq_euclid",
                 parameters: Optional[HNSWParameters] = None,
                 block_size: int = 128, router: str = "exact",
                 kmeans_iters: int = 6):
        dst.check_metric(metric)
        if dst.is_custom(metric):
            raise ValueError(
                "BlockIndex requires a dot-decomposable built-in metric")
        if router not in ("exact", "hnsw"):
            raise ValueError("router must be 'exact' or 'hnsw'")
        self.dim = int(dim)
        self.metric = metric
        self.params = parameters or HNSWParameters()
        self.block_size = int(block_size)
        self.router = router
        self.kmeans_iters = int(kmeans_iters)
        self._built = False

    # -- build -----------------------------------------------------------

    def build(self, vectors) -> None:
        """Bulk build: cluster, lay out contiguous blocks, build router."""
        vecs = np.ascontiguousarray(np.asarray(vectors, np.float32))
        if vecs.ndim != 2 or vecs.shape[1] != self.dim:
            raise ValueError(f"expected (n, {self.dim}) vectors")
        N = vecs.shape[0]
        BS = self.block_size
        seed = (self.params.random_seed if self.params.random_seed >= 0
                else None)
        rng = np.random.default_rng(seed)

        blk_ids, blk_vecs = _layout_blocks(vecs, BS, self.kmeans_iters, rng)
        NB = blk_ids.shape[0]
        fill = (blk_ids >= 0)
        id_to_pos = np.zeros(N, np.int64)
        flat_ids = blk_ids.reshape(-1)
        id_to_pos[flat_ids[flat_ids >= 0]] = np.flatnonzero(flat_ids >= 0)
        self._id_to_pos = id_to_pos
        # host copy for float64 refinement (fetching the device array per
        # query would ship the whole block table across the wire)
        self._host_flat = blk_vecs.reshape(-1, self.dim)
        cents = blk_vecs.sum(axis=1) / np.maximum(
            fill.sum(axis=1), 1)[:, None]

        self._blk_vecs = jnp.asarray(blk_vecs)
        self._blk_ids = jnp.asarray(blk_ids)
        self._blk_fill = jnp.asarray(fill.sum(axis=1).astype(np.int32))
        self._blk_norms = jnp.where(
            jnp.asarray(fill),
            dst.norm_data(self.metric, self._blk_vecs), 0.0)
        self._cents = jnp.asarray(cents.astype(np.float32))
        self._cent_norms = dst.norm_data(self.metric, self._cents)
        self.n_blocks = NB
        self.count = N
        import jax as _jax
        self._use_pallas = _jax.devices()[0].platform in ("tpu", "axon")

        if self.router == "hnsw":
            from .index import HNSWIndex
            p = HNSWParameters(collection_size=NB,
                               random_seed=self.params.random_seed)
            self._router_index = HNSWIndex(self.dim, self.metric, p)
            self._router_index.add(np.asarray(self._cents))
        self._built = True

    # -- persistence ------------------------------------------------------

    def serialize(self, path: str) -> None:
        """Snapshot the block layout + router to one .npz."""
        if not self._built:
            raise RuntimeError("nothing to serialize: build() first")
        import json
        header = {
            "dim": self.dim, "metric": self.metric,
            "block_size": self.block_size, "router": self.router,
            "count": int(self.count), "n_blocks": int(self.n_blocks),
            "random_seed": int(self.params.random_seed),
        }
        np.savez_compressed(
            path,
            header=np.frombuffer(json.dumps(header).encode(), np.uint8),
            blk_vecs=np.asarray(self._blk_vecs),
            blk_ids=np.asarray(self._blk_ids),
            cents=np.asarray(self._cents))

    @classmethod
    def deserialize(cls, path: str) -> "BlockIndex":
        import json
        from .core.snapshot import npz_path
        with np.load(npz_path(path)) as z:
            header = json.loads(bytes(z["header"]).decode())
            params = HNSWParameters(
                random_seed=int(header.get("random_seed", 31337)))
            ix = cls(header["dim"], header["metric"], parameters=params,
                     block_size=header["block_size"],
                     router=header["router"])
            blk_vecs = z["blk_vecs"]
            blk_ids = z["blk_ids"]
            cents = z["cents"]
        fill = blk_ids >= 0
        ix._blk_vecs = jnp.asarray(blk_vecs)
        ix._blk_ids = jnp.asarray(blk_ids)
        ix._blk_fill = jnp.asarray(fill.sum(axis=1).astype(np.int32))
        ix._blk_norms = jnp.where(
            jnp.asarray(fill), dst.norm_data(ix.metric, ix._blk_vecs), 0.0)
        ix._cents = jnp.asarray(cents)
        ix._cent_norms = dst.norm_data(ix.metric, ix._cents)
        ix.n_blocks = int(header["n_blocks"])
        ix.count = int(header["count"])
        id_to_pos = np.zeros(ix.count, np.int64)
        flat = blk_ids.reshape(-1)
        id_to_pos[flat[flat >= 0]] = np.flatnonzero(flat >= 0)
        ix._id_to_pos = id_to_pos
        ix._host_flat = blk_vecs.reshape(-1, ix.dim)
        import jax as _jax
        ix._use_pallas = _jax.devices()[0].platform in ("tpu", "axon")
        if ix.router == "hnsw":
            # Same seed as build() so the reloaded router graph (and hence
            # routing/recall) matches the pre-snapshot index exactly.
            from .index import HNSWIndex
            p = HNSWParameters(collection_size=ix.n_blocks,
                               random_seed=ix.params.random_seed)
            ix._router_index = HNSWIndex(ix.dim, ix.metric, p)
            ix._router_index.add(np.asarray(ix._cents))
        ix._built = True
        return ix

    # -- query -----------------------------------------------------------

    def _route(self, qj, n_probe: int):
        if self.router == "hnsw":
            from .core.search import knn_search
            ri = self._router_index
            ef = max(n_probe, ri.params.min_nn)
            mi = (ri._cfg.search_iter_factor * ef) \
                // max(1, ri.params.query_expand) + 16
            _, bids = knn_search(ri._cfg, ri._state, qj, 0, ef, mi,
                                 expand=max(1, ri.params.query_expand))
            return bids[:, :n_probe]
        return _route_exact(self.metric, self._cents, self._cent_norms,
                            qj, n_probe)

    def query_device(self, qj, k: int, n_probe: int = 32):
        """Device-level query: returns (dists, ids) device arrays without
        host-side refinement/sync — the form benchmark loops and in-graph
        consumers want.  ``knn_query`` wraps this with float64 refinement.
        """
        n_probe = min(n_probe, self.n_blocks)
        bids = self._route(qj, n_probe)
        if self._use_pallas:
            return _score_blocks_pallas(
                self.metric, self._blk_vecs, self._blk_ids, self._blk_fill,
                qj, bids, k)
        return _score_blocks(self.metric, self._blk_vecs, self._blk_ids,
                             self._blk_norms, qj, bids, k)

    def knn_query(self, queries, k: int, n_probe: int = 32
                  ) -> Tuple[np.ndarray, np.ndarray]:
        """Batched k-NN: route to ``n_probe`` blocks, exact-score them on
        the MXU.  Returns (ids (n, k) int32, dists (n, k) f32), -1/NaN
        padded."""
        if not self._built:
            raise RuntimeError("BlockIndex.build() must be called first")
        q = np.ascontiguousarray(np.asarray(queries, np.float32))
        if q.ndim == 1:
            q = q[None]
        d, i = self.query_device(jnp.asarray(q), k, n_probe)
        return self._refine(q, np.asarray(i), k)

    def _refine(self, q: np.ndarray, ids: np.ndarray, k: int):
        """Recompute returned distances in float64 and re-sort (the
        ranking panel may be computed at reduced precision)."""
        pos = self._id_to_pos
        rows = pos[np.clip(ids, 0, self.count - 1)]
        vecs = self._host_flat[rows].astype(np.float64)
        qq = q.astype(np.float64)[:, None, :]
        if self.metric == "sq_euclid":
            d = np.sum((qq - vecs) ** 2, axis=-1)
        else:
            dot = np.sum(qq * vecs, axis=-1)
            if self.metric == "cosine":
                qn = np.linalg.norm(qq, axis=-1)
                cn = np.linalg.norm(vecs, axis=-1)
                den = qn * cn
                d = np.where(den > 0, 1.0 - dot / np.where(den > 0, den, 1),
                             1.0)
            else:
                d = 1.0 - dot
        d = np.where(ids >= 0, d, np.inf)
        order = np.argsort(d, axis=1, kind="stable")[:, :k]
        r = np.arange(ids.shape[0])[:, None]
        out_ids = ids[r, order].astype(np.int32)
        out_d = d[r, order].astype(np.float32)
        return out_ids, np.where(out_ids >= 0, out_d, np.nan)


@partial(jax.jit, static_argnames=("metric", "n_probe"))
def _route_exact(metric, cents, cent_norms, q, n_probe: int):
    qn = dst.norm_data(metric, q)
    d = dst.pairwise(metric, q, cents, qn, cent_norms)
    k2 = min(cents.shape[0], n_probe)
    _, idx = lax.approx_min_k(d, k2, recall_target=0.99)
    return idx.astype(jnp.int32)


@partial(jax.jit, static_argnames=("metric", "k"))
def _score_blocks_pallas(metric, blk_vecs, blk_ids, blk_fill, q, bids,
                         k: int):
    """Score probed blocks with the fused Pallas DMA+MXU kernel
    (ops/pallas_block.py) and select top-k from the distance panel.
    Partially-filled blocks are masked with their fill counts (no
    per-row id gather needed)."""
    from .ops.pallas_block import block_scores
    B, P = bids.shape
    NB, BS, D = blk_vecs.shape
    panel = block_scores(metric, blk_vecs, bids, q)     # (B, P*BS)
    fillp = blk_fill[jnp.clip(bids, 0, NB - 1)]          # (B, P)
    ok = (jnp.arange(BS)[None, None, :] < fillp[:, :, None]) \
        & (bids >= 0)[:, :, None]
    panel = jnp.where(ok.reshape(B, P * BS), panel, jnp.inf)
    # oversample the panel selection; the caller re-ranks in float64
    k2 = min(max(2 * k, 32), P * BS)
    vals, pos = lax.approx_min_k(panel, k2, recall_target=0.99)
    blk_of = jnp.take_along_axis(bids, pos // BS, axis=1)
    slot_of = pos % BS
    ids = blk_ids[jnp.clip(blk_of, 0, NB - 1), slot_of]
    ids = jnp.where(jnp.isfinite(vals), ids, -1)
    return vals, ids


@partial(jax.jit, static_argnames=("metric", "k"))
def _score_blocks(metric, blk_vecs, blk_ids, blk_norms, q, bids, k: int):
    """Exact MXU scoring of each query's probed blocks.

    Blocks are fetched in small groups so transient memory stays bounded;
    each fetch is contiguous (BS, D) rows — the whole point of the block
    layout."""
    B, P = bids.shape
    NB, BS, D = blk_vecs.shape
    qn = dst.norm_data(metric, q)
    PG = max(1, min(P, 2 ** 20 // max(1, BS * D // 128)))  # transient cap
    PG = min(PG, 4)
    npad = -(-P // PG) * PG - P
    if npad:
        bids = jnp.pad(bids, ((0, 0), (0, npad)), constant_values=-1)
    P2 = bids.shape[1]

    def body(g, carry):
        bd, bi = carry
        ids_g = lax.dynamic_slice_in_dim(bids, g * PG, PG, axis=1)  # (B,PG)
        ok = ids_g >= 0
        idc = jnp.clip(ids_g, 0, NB - 1)
        vg = blk_vecs[idc]                      # (B, PG, BS, D) contiguous
        ng = blk_norms[idc]                     # (B, PG, BS)
        ig = blk_ids[idc]                       # (B, PG, BS)
        lo = vg.dtype == jnp.bfloat16
        dots = jnp.einsum("bpsd,bd->bps", vg, q.astype(vg.dtype),
                          precision=None if lo else dst.DOT_PRECISION,
                          preferred_element_type=jnp.float32)
        dd = dst.from_dot(metric, dots, qn[:, None, None], ng)
        valid = (ig >= 0) & ok[:, :, None]
        dd = jnp.where(valid, dd, jnp.inf).reshape(B, PG * BS)
        ii = jnp.where(valid, ig, -1).reshape(B, PG * BS)
        md = jnp.concatenate([bd, dd], axis=1)
        mi = jnp.concatenate([bi, ii], axis=1)
        ordr = jnp.argsort(md, axis=1)[:, :k]
        return (jnp.take_along_axis(md, ordr, axis=1),
                jnp.take_along_axis(mi, ordr, axis=1))

    bd0 = jnp.full((B, k), jnp.inf, jnp.float32)
    bi0 = jnp.full((B, k), -1, jnp.int32)
    bd, bi = lax.fori_loop(0, P2 // PG, body, (bd0, bi0))
    bi = jnp.where(jnp.isfinite(bd), bi, -1)
    return bd, bi
