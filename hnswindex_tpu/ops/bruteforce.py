"""Exact blocked brute-force k-NN on the MXU.

On matmul hardware the crossover point where graph traversal beats exact
search is far higher than on CPU: scoring a query batch against the whole
corpus is one large matmul (the op the MXU was built for), while graph
traversal is bandwidth-bound row gathers.  On v5e, 1024 queries x 1M x
128-d is ~260 GFLOP — about a millisecond of MXU time — so exact search
wins below roughly 10M vectors while returning recall 1.0.

This module provides that path:

* as the engine for `HNSWIndex.knn_query(..., exact=True)`;
* as the ground-truth oracle for recall tests and benchmarks;
* as the per-shard scorer for the sharded index's exact mode.

The corpus is streamed in column blocks with a running top-k merge, so
peak memory is (B, block) not (B, C).  Scores use the dot-product
decomposition with precomputed corpus norms (ops/distance.py); the
returned distances are exact f32.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from . import distance as dst

_BLOCK = 65536


@partial(jax.jit, static_argnames=("metric", "k", "block"))
def exact_knn(metric: str, vectors: jnp.ndarray, norms: jnp.ndarray,
              active: jnp.ndarray, q: jnp.ndarray, k: int,
              block: int = _BLOCK, exclude=None):
    """Exact top-k over the active corpus.

    ``vectors (C, D)``, ``norms (C,)``, ``active (C,) bool``, ``q (B, D)``.
    Optional ``exclude (B,)`` masks one id per query (self-exclusion for
    construction waves).  Returns (dists (B, k), ids (B, k)) ascending,
    -1/inf padded for inactive-only slots."""
    if dst.is_custom(metric):
        raise ValueError("exact_knn requires a dot-decomposable metric")
    C, D = vectors.shape
    B = q.shape[0]
    qn = dst.norm_data(metric, q)
    block = min(block, C)
    nblocks = -(-C // block)
    Cp = nblocks * block

    pad = Cp - C
    if pad:
        vectors = jnp.pad(vectors, ((0, pad), (0, 0)))
        norms = jnp.pad(norms, (0, pad))
        active = jnp.pad(active, (0, pad))

    # Per-block selection uses the TPU-accelerated approx_min_k with a 4x
    # oversampled k (the hardware PartialReduce's per-block recall target
    # composes with oversampling to make missing a true top-k entry
    # vanishingly unlikely); the cross-block merge then re-ranks the
    # (nblocks * k2) survivors exactly, and callers re-rank the returned k
    # in float64.  Tightening recall_target from 0.95 to 0.999 costs ~3x
    # in selection time for no measurable recall difference at 4x
    # oversample.
    k2 = min(block, max(4 * k, k + 16))

    def body(i, carry):
        bd, bi = carry
        vblk = lax.dynamic_slice_in_dim(vectors, i * block, block)
        nblk = lax.dynamic_slice_in_dim(norms, i * block, block)
        ablk = lax.dynamic_slice_in_dim(active, i * block, block)
        lo = vectors.dtype == jnp.bfloat16
        dots = jnp.einsum("bd,cd->bc", q.astype(vblk.dtype), vblk,
                          precision=None if lo else dst.DOT_PRECISION,
                          preferred_element_type=jnp.float32)
        d = dst.from_dot(metric, dots, qn[:, None], nblk[None, :])
        d = jnp.where(ablk[None, :], d, jnp.inf)
        if exclude is not None:
            ids_blk = i * block + jax.lax.broadcasted_iota(
                jnp.int32, (B, block), 1)
            d = jnp.where(ids_blk == exclude[:, None], jnp.inf, d)
        vals, idx = lax.approx_min_k(d, k2, recall_target=0.95)
        ids = i * block + idx.astype(jnp.int32)
        bd = lax.dynamic_update_slice_in_dim(bd, vals, i * k2, axis=1)
        bi = lax.dynamic_update_slice_in_dim(bi, ids, i * k2, axis=1)
        return bd, bi

    bd0 = jnp.full((B, nblocks * k2), jnp.inf, jnp.float32)
    bi0 = jnp.full((B, nblocks * k2), -1, jnp.int32)
    bd, bi = lax.fori_loop(0, nblocks, body, (bd0, bi0))
    order = jnp.argsort(bd, axis=1)[:, :k]
    bd = jnp.take_along_axis(bd, order, axis=1)
    bi = jnp.take_along_axis(bi, order, axis=1)
    bi = jnp.where(jnp.isfinite(bd), bi, -1)
    return bd, bi


#: Lane count of the fused streaming scan (ops/fused_scan.py); also the
#: upper bound on its survivor width.
FUSED_BS = 1024


@partial(jax.jit, static_argnames=("metric", "k", "block", "oversample",
                                   "recall_target", "panel_bf16",
                                   "survivor_floor", "fused"))
def exact_knn2(metric: str, vectors: jnp.ndarray, coarse: jnp.ndarray,
               norms: jnp.ndarray, active: jnp.ndarray, q: jnp.ndarray,
               k: int, block: int = _BLOCK, oversample: int = 4,
               exclude=None, recall_target: float = 0.95,
               panel_bf16: bool = True, survivor_floor: int = 256,
               fused: bool | None = None):
    """Two-stage exact top-k: bf16 coarse scan + exact f32 rescore.

    Stage 1 scans the whole corpus on the MXU's native bf16 input type
    (``coarse`` is the bf16 mirror of ``vectors``) keeping an
    ``oversample * k`` survivor set per query; stage 2 gathers the
    survivors' f32 rows and rescores them at full precision.  ~3-6x the
    f32-HIGHEST scan rate; bf16 dot noise (~0.4% relative) only matters
    if a true top-k member ranks below the oversampled cut, which the
    f64 refinement layer above cannot repair — hence the default 4x
    oversample (measured recall 1.000 at 1M clustered, see bench.py).

    Same contract as :func:`exact_knn`."""
    if dst.is_custom(metric):
        raise ValueError("exact_knn2 requires a dot-decomposable metric")
    C, D = vectors.shape
    # The coarse scan may cover only a prefix of the store: construction
    # passes ``coarse/norms/active`` sliced to the high-water slot mark so
    # the per-wave scan cost tracks the corpus actually built, not the
    # preallocated capacity (a 4x saving early in a capacity-sized build).
    # Survivor ids are positions in the prefix == global ids, so the f32
    # rescore still gathers from the full ``vectors`` store.
    Cs = coarse.shape[0]
    B = q.shape[0]
    # Survivor width: the k+256 floor keeps small user-facing k deep
    # inside the cut (the approx reduce's misses cluster near the
    # boundary; measured recall@10 at 1M clustered: S=74 -> 0.948,
    # S=266 -> 0.997, S=510 -> 0.999), and the f32 rescore restores
    # exact order among survivors.
    # The k+floor survivor width keeps user-facing k deep inside the
    # approx reduce's miss zone; candidate-generation callers that only
    # consume a prefix of the k results lower ``survivor_floor`` to shrink
    # the (B, S)-row rescore gather (row-count-bound).
    S = min(Cs, max(oversample * k, k + survivor_floor))
    qn = dst.norm_data(metric, q)
    qlo = q.astype(jnp.bfloat16)

    # Stage 1 has two forms.  Preferred: the fused Pallas streaming scan
    # (ops/fused_scan.lane_min_scan) — one read of the coarse table, the
    # (B, FUSED_BS) lane-min accumulators resident in VMEM, no (B, C)
    # panel at all (the panel's write+read was ~17 GB per 512-wave at
    # 8.4M rows and dominated the scan).  Fallback (CPU tests, lane
    # misalignment, wide S): the einsum + approx_min_k panel path.
    if fused is None:
        fused = (panel_bf16 and coarse.dtype == jnp.bfloat16
                 and Cs % (8 * FUSED_BS) == 0 and S <= FUSED_BS
                 # the tunneled production backend registers as "axon",
                 # not "tpu" (same idiom as block.py's Pallas gate)
                 and jax.default_backend() in ("tpu", "axon"))

    if fused:
        from .fused_scan import lane_min_scan, rank_transform

        mult, bias = rank_transform(metric, norms, active)
        QC = min(B, 1024)     # (QC, FUSED_BS) f32+i32 accumulators in VMEM
        n_chunks = -(-B // QC)
        Bp = n_chunks * QC
        qpad0 = jnp.pad(qlo, ((0, Bp - B), (0, 0)))
        exc = (jnp.pad(exclude, (0, Bp - B), constant_values=-1)
               if exclude is not None else jnp.full((Bp,), -1, jnp.int32))

        def fused_chunk(args):
            qc, exc_c = args
            vals, ids = lane_min_scan(coarse, mult, bias, qc, exc_c,
                                      BS=FUSED_BS)
            sv, sx = lax.approx_min_k(vals, S, recall_target=0.99)
            sid = jnp.take_along_axis(ids, sx, axis=1)
            # lanes that never saw a finite key carry ~3e38 sentinels
            return jnp.where(sv < 1.0e37, sid, -1)

        si = lax.map(fused_chunk, (qpad0.reshape(n_chunks, QC, D),
                                   exc.reshape(n_chunks, QC)))
        si = si.reshape(Bp, S)[:B]
        return _rescore_topk(metric, vectors, norms, q, qn, si, k)

    # Fallback stage 1: full-width coarse scan, chunked over QUERY rows so
    # the (QC, C) distance panel stays ~1 GB in bf16.  One einsum + ONE
    # hardware PartialReduce per chunk: a corpus-block fori_loop issuing a
    # separate approx_min_k per block costs hundreds of narrow reductions
    # at 8M rows and dominated the whole scan (~8x the fused form).  The
    # elementwise chain (from_dot -> masks -> bf16 cast) fuses into the
    # einsum's consumer, so the panel is written once at 2 bytes/row.
    QC = min(B, max(16, (1 << 31) // (4 * Cs)))
    n_chunks = -(-B // QC)
    Bp = n_chunks * QC
    qpad0 = jnp.pad(qlo, ((0, Bp - B), (0, 0)))
    qnp0 = jnp.pad(qn, (0, Bp - B))
    exc = (jnp.pad(exclude, (0, Bp - B), constant_values=-1)
           if exclude is not None else jnp.full((Bp,), -1, jnp.int32))

    def scan_chunk(args):
        qc, qnc, exc_c = args
        dots = jnp.einsum("bd,cd->bc", qc, coarse,
                          preferred_element_type=jnp.float32)
        d = dst.from_dot(metric, dots, qnc[:, None], norms[None, :])
        d = jnp.where(active[None, :], d, jnp.inf)
        ids_row = jax.lax.broadcasted_iota(jnp.int32, (QC, Cs), 1)
        d = jnp.where(ids_row == exc_c[:, None], jnp.inf, d)
        # The hardware PartialReduce's misses concentrate near the rank-S
        # cut boundary, so survivor quality is bought with a WIDE S (the
        # true top-k sit deep inside), not with a tight recall_target —
        # recall_target >~ 0.99 makes the reduce slower than the matmul.
        # panel_bf16 halves the panel's HBM traffic at ~0.4% distance
        # noise (absorbed by S); panel_bf16=False keeps the panel f32 for
        # exactness-critical callers.
        d16 = d.astype(jnp.bfloat16) if panel_bf16 else d
        vals, idx = lax.approx_min_k(d16, min(S, Cs),
                                     recall_target=recall_target)
        return vals.astype(jnp.float32), idx.astype(jnp.int32)

    bd, bi = lax.map(scan_chunk, (qpad0.reshape(n_chunks, QC, D),
                                  qnp0.reshape(n_chunks, QC),
                                  exc.reshape(n_chunks, QC)))
    sbd = bd.reshape(Bp, -1)[:B]
    si = bi.reshape(Bp, -1)[:B]
    # survivors whose coarse distance is inf are masked slots (inactive /
    # excluded rows): approx_min_k still emits real indices for them, and
    # rescoring those rows against the exact store would resurrect them
    # with finite distances
    si = jnp.where(jnp.isfinite(sbd), si, -1)
    return _rescore_topk(metric, vectors, norms, q, qn, si, k)


def _rescore_topk(metric: str, vectors, norms, q, qn, si, k: int):
    """Stage 2: gather the (B, S) survivor rows, rescore in f32, and take
    the exact top-k among them (-1 survivor slots stay masked)."""
    C = vectors.shape[0]
    B, S = si.shape
    chunk = min(B, 2048)
    n_chunks = -(-B // chunk)
    qpad = jnp.pad(q, ((0, n_chunks * chunk - B), (0, 0)))
    qnp = jnp.pad(qn, (0, n_chunks * chunk - B))
    sip = jnp.pad(si, ((0, n_chunks * chunk - B), (0, 0)),
                  constant_values=-1)

    def rescore(args):
        qc, qnc, sic_ = args
        g = jnp.clip(sic_, 0, C - 1)
        d = dst.gathered(metric, qc, qnc, vectors[g], norms[g])
        return jnp.where(sic_ >= 0, d, jnp.inf)

    sd = lax.map(rescore, (qpad.reshape(n_chunks, chunk, -1),
                           qnp.reshape(n_chunks, chunk),
                           sip.reshape(n_chunks, chunk, S)))
    sd = sd.reshape(n_chunks * chunk, S)[:B]
    order2 = jnp.argsort(sd, axis=1)[:, :k]
    fd = jnp.take_along_axis(sd, order2, axis=1)
    fi = jnp.take_along_axis(si, order2, axis=1)
    fi = jnp.where(jnp.isfinite(fd), fi, -1)
    return fd, fi


@partial(jax.jit, static_argnames=("metric", "block"))
def range_distances(metric: str, vectors: jnp.ndarray, norms: jnp.ndarray,
                    active: jnp.ndarray, q1: jnp.ndarray, radius,
                    block: int = _BLOCK):
    """(C,) exact distances of one query to every active row within
    ``radius`` (inf elsewhere) — the giant-radius exact-range path for
    corpora too large to mirror on the host (the host then takes one
    bounded (C,) f32 transfer instead of the full vector table)."""
    if dst.is_custom(metric):
        raise ValueError("range_distances requires a dot-decomposable "
                         "metric")
    C, D = vectors.shape
    qn = dst.norm_data(metric, q1[None])[0]
    block = min(block, C)
    nblocks = -(-C // block)
    pad = nblocks * block - C
    if pad:
        vectors = jnp.pad(vectors, ((0, pad), (0, 0)))
        norms = jnp.pad(norms, (0, pad))
        active = jnp.pad(active, (0, pad))

    def body(i, acc):
        vblk = lax.dynamic_slice_in_dim(vectors, i * block, block)
        nblk = lax.dynamic_slice_in_dim(norms, i * block, block)
        ablk = lax.dynamic_slice_in_dim(active, i * block, block)
        dots = jnp.einsum("d,cd->c", q1, vblk, precision=dst.DOT_PRECISION,
                          preferred_element_type=jnp.float32)
        d = dst.from_dot(metric, dots, qn, nblk)
        d = jnp.where(ablk & (d <= radius), d, jnp.inf)
        return lax.dynamic_update_slice_in_dim(acc, d, i * block, 0)

    acc = lax.fori_loop(0, nblocks, body,
                        jnp.full((nblocks * block,), jnp.inf, jnp.float32))
    return acc[:C]


@partial(jax.jit, static_argnames=("metric", "block"))
def range_count(metric: str, vectors: jnp.ndarray, norms: jnp.ndarray,
                active: jnp.ndarray, q: jnp.ndarray, radius,
                block: int = _BLOCK):
    """Exact count of active corpus rows within ``radius`` of each query.

    One blocked MXU scan — cheaper than a single mis-sized graph range
    retry, so the host uses it to size the range-search result pool
    up front instead of a grow-and-recompile ladder."""
    if dst.is_custom(metric):
        raise ValueError("range_count requires a dot-decomposable metric")
    C, D = vectors.shape
    B = q.shape[0]
    qn = dst.norm_data(metric, q)
    block = min(block, C)
    nblocks = -(-C // block)
    pad = nblocks * block - C
    if pad:
        vectors = jnp.pad(vectors, ((0, pad), (0, 0)))
        norms = jnp.pad(norms, (0, pad))
        active = jnp.pad(active, (0, pad))

    def body(i, acc):
        vblk = lax.dynamic_slice_in_dim(vectors, i * block, block)
        nblk = lax.dynamic_slice_in_dim(norms, i * block, block)
        ablk = lax.dynamic_slice_in_dim(active, i * block, block)
        lo = vectors.dtype == jnp.bfloat16
        dots = jnp.einsum("bd,cd->bc", q.astype(vblk.dtype), vblk,
                          precision=None if lo else dst.DOT_PRECISION,
                          preferred_element_type=jnp.float32)
        d = dst.from_dot(metric, dots, qn[:, None], nblk[None, :])
        return acc + jnp.sum((d <= radius) & ablk[None, :], axis=1,
                             dtype=jnp.int32)

    return lax.fori_loop(0, nblocks, body, jnp.zeros((B,), jnp.int32))
