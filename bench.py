"""Benchmark: build + batched k-NN throughput on one chip.

Prints ONE JSON line:
  {"metric": "knn_qps_chip", "value": <qps>, "unit": "queries/s",
   "vs_baseline": <qps / 100_000>}

Defaults reflect driver scale: 1M clustered 128-d vectors (the BASELINE
SIFT1M shape; clustered synthetic is the honest proxy — uniform random is
the adversarial worst case for any graph ANN).  Override with BENCH_N /
BENCH_DIM / BENCH_DATA / BENCH_METRIC / BENCH_QBATCH / BENCH_K.

The headline is the throughput of the best serving mode that clears the
reference's own recall bar (recall@10 >= 0.85 self-consistency,
GraphTests.cs:28):

* graph  — HNSW beam search over packed neighborhood tiles (core/pack.py,
  the default layer-0 serving path) and the unpacked fallback;
* block  — two-level MXU scoring (block.py);
* exact  — blocked brute-force on the MXU (recall 1.0).

Every mode's qps + recall, the build rate, and rough efficiency numbers
(exact-mode MFU, graph-mode HBM traffic) go to stderr so the headline is
auditable.  The baseline divisor is the driver-set north star
(BASELINE.json): >= 100k queries/sec/chip batched on v5e.
"""

import json
import os
import sys
import threading
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _watchdog(budget_s: float):
    """Hard exit if the run wedges (a hung device tunnel would otherwise
    block the harness forever; an error exit is recordable, a hang is
    not).  Normal runs finish far inside the budget."""
    def arm():
        time.sleep(budget_s)
        log(f"bench watchdog: no result after {budget_s:.0f}s — aborting")
        os._exit(3)
    t = threading.Thread(target=arm, daemon=True)
    t.start()


def main():
    n = int(os.environ.get("BENCH_N", "1000000"))
    dim = int(os.environ.get("BENCH_DIM", "128"))
    metric = os.environ.get("BENCH_METRIC", "sq_euclid")
    data_kind = os.environ.get("BENCH_DATA", "clustered")
    q_batch = int(os.environ.get("BENCH_QBATCH", "1024"))
    k = int(os.environ.get("BENCH_K", "10"))
    reps = int(os.environ.get("BENCH_REPS", "10"))

    import jax
    import jax.numpy as jnp
    log("devices:", jax.devices())

    from hnswindex_tpu import HNSWIndex, HNSWParameters
    from hnswindex_tpu.core import pack as PK
    from hnswindex_tpu.core.search import knn_search
    from hnswindex_tpu.ops.bruteforce import exact_knn, exact_knn2

    rng = np.random.default_rng(65537)
    if data_kind == "clustered":
        # proxy for real embedding datasets (SIFT/GloVe/DEEP have strong
        # cluster structure; uniform random is the adversarial worst case)
        centers = rng.random((max(2, n // 500), dim)).astype(np.float32)
        vecs = (centers[rng.integers(0, centers.shape[0], n)]
                + 0.03 * rng.standard_normal((n, dim)).astype(np.float32))
    else:
        vecs = rng.random((n, dim), dtype=np.float32)
    if metric == "ucosine":
        vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)

    params = HNSWParameters(collection_size=n, max_wave_size=512)
    idx = HNSWIndex(dim, metric, parameters=params)

    # -- build: first half warms every wave-bucket compilation; second half
    # is the steady-state measurement
    half = n // 2
    t0 = time.perf_counter()
    idx.add(vecs[:half])
    # block_until_ready is async-fake through the remote relay — a real
    # readback that depends on the last wave's writes is the only honest
    # build-time fence
    np.asarray(jnp.sum(idx._state.deg0))
    warm_s = time.perf_counter() - t0
    up0 = idx.upload_seconds
    t0 = time.perf_counter()
    idx.add(vecs[half:])
    np.asarray(jnp.sum(idx._state.deg0))
    steady_s = time.perf_counter() - t0
    build_rate = (n - half) / steady_s
    # split the steady wall into measured link cost (fenced slab-upload
    # seconds inside add()) vs engine cost: through the tunneled relay
    # the 256 MB steady-half ingest can eat half the wall, which no
    # production PCIe host would pay
    upload_s = idx.upload_seconds - up0
    engine_rate = (n - half) / max(1e-9, steady_s - upload_s)
    log(f"build: total {warm_s + steady_s:.1f}s; steady-state "
        f"{build_rate:.0f} inserts/s (slab upload {upload_s:.1f}s of "
        f"{steady_s:.1f}s -> engine-side {engine_rate:.0f} inserts/s)")
    # Through a tunneled backend the build is often HOST->DEVICE BOUND,
    # not engine-bound: add() ships dim*4 bytes per insert and the relay
    # has run anywhere from 2.9 to 18 MB/s on different days.  Measure
    # the link and say so (benchmarks/device_build_probe.py measures the
    # engine with device-resident waves; production hosts ingest over
    # PCIe at >10 GB/s where this ceiling is irrelevant).
    probe = np.zeros((1 << 21,), np.float32)  # 8 MB
    # warm the consumer program on a device-resident array first: the
    # earlier jnp.sum calls ran on int32, so an unwarmed f32 probe would
    # fold a relay compile into the measured MB/s and falsely flag
    # transfer-bound builds
    np.asarray(jnp.sum(jnp.zeros((1 << 21,), jnp.float32)))
    t0 = time.perf_counter()
    np.asarray(jnp.sum(jnp.asarray(probe)))
    h2d = 8.0 / max(1e-9, time.perf_counter() - t0)
    ceil = h2d * (1 << 20) / (dim * 4)
    log(f"H2D link: {h2d:.1f} MB/s -> ingest ceiling ~{ceil:.0f} "
        f"inserts/s{' (BUILD IS TRANSFER-BOUND)' if build_rate > 0.3 * ceil else ''}")

    cfg = idx._cfg
    state = idx._state
    queries = jnp.asarray(vecs[:q_batch])

    def throughput(run):
        d, i = run(queries)
        np.asarray(i)  # force full sync through the transfer path
        t0 = time.perf_counter()
        for _ in range(reps):
            d, i = run(queries)
        np.asarray(i)
        return reps * q_batch / (time.perf_counter() - t0)

    # ground truth for the query batch: host float64 brute force at
    # moderate sizes, device scorer beyond.
    if n <= 300000:
        qh = vecs[:q_batch].astype(np.float64)
        vh = vecs.astype(np.float64)
        vn2 = (vh * vh).sum(1)
        gt = np.empty((q_batch, k), np.int64)
        for s0 in range(0, q_batch, 128):
            qs_ = qh[s0:s0 + 128]
            d = ((qs_ * qs_).sum(1)[:, None] + vn2[None, :]
                 - 2.0 * qs_ @ vh.T)
            part = np.argpartition(d, k, axis=1)[:, :k]
            rows = np.arange(part.shape[0])[:, None]
            ord_ = np.argsort(d[rows, part], axis=1)
            gt[s0:s0 + 128] = part[rows, ord_]
    else:
        gt = np.asarray(exact_knn(cfg.metric, state.vectors, state.norms,
                                  state.active, queries, k)[1])

    def recall_of(ids):
        return float(np.mean([
            len(set(ids[r].tolist()) & set(gt[r].tolist())) / k
            for r in range(ids.shape[0])]))

    candidates = []

    # graph mode, packed (the default serving path at scale)
    t0 = time.perf_counter()
    pk = idx._get_pack()
    if pk is not None:
        jax.block_until_ready(pk.res)
        log(f"pack build: {time.perf_counter() - t0:.1f}s "
            f"(entry set {int(pk.entry_ids.shape[0])})")
        expand = max(1, params.query_expand)
        for ef in (max(k, 12), 16, 32, 64):
            mi = (cfg.search_iter_factor * ef) // expand + 16

            def prun(qs, ef=ef, mi=mi):
                return PK.packed_knn_search(cfg, pk, qs, ef, mi,
                                            expand=expand,
                                            n_entry=min(8, ef))

            qps = throughput(prun)
            rec = recall_of(np.asarray(prun(queries)[1])[:, :k])
            # graph traffic estimate: ~ef expansions x one (K, D) tile
            K = int(pk.nbr0.shape[1])
            gbps = qps * ef * K * (dim * 2 + 8) / 1e9
            log(f"graph-packed ef={ef}: {qps:.0f} q/s, recall@{k} "
                f"{rec:.3f} (~{gbps:.0f} GB/s tile traffic)")
            if rec > 0.85:
                candidates.append((qps, f"graph-packed(ef={ef})", rec))

    # graph mode, unpacked fallback (also the custom-metric path)
    expand = max(1, params.query_expand)
    for ef in (64,):
        mi = (cfg.search_iter_factor * ef) // expand + 16

        def grun(qs, ef=ef, mi=mi):
            return knn_search(cfg, state, qs, 0, ef, mi, expand=expand)

        qps = throughput(grun)
        rec = recall_of(np.asarray(grun(queries)[1])[:, :k])
        log(f"graph-unpacked ef={ef}: {qps:.0f} q/s, recall@{k} {rec:.3f}")
        if rec > 0.85:
            candidates.append((qps, f"graph(ef={ef})", rec))

    # block mode (two-level MXU scoring)
    from hnswindex_tpu.block import BlockIndex
    bix = BlockIndex(dim, metric, parameters=params)
    t0 = time.perf_counter()
    bix.build(vecs)
    log(f"block build: {time.perf_counter() - t0:.1f}s "
        f"({bix.n_blocks} blocks)")
    for n_probe in (2, 3, 4, 8, 16, 64, 128):
        if n_probe > bix.n_blocks:
            continue

        def block_run(qs, npb=n_probe):
            return bix.query_device(qs, k, n_probe=npb)

        qps = throughput(block_run)
        rec = recall_of(np.asarray(block_run(queries)[1])[:, :k])
        log(f"block n_probe={n_probe}: {qps:.0f} q/s, recall@{k} {rec:.3f}")
        if rec > 0.85:
            candidates.append((qps, f"block(n_probe={n_probe})", rec))

    ct = state.coarse_table

    def exact_run(qs):
        if ct is not None:
            return exact_knn2(cfg.metric, state.vectors, ct, state.norms,
                              state.active, qs, k)
        return exact_knn(cfg.metric, state.vectors, state.norms,
                         state.active, qs, k)

    exact_qps = throughput(exact_run)
    exact_rec = recall_of(np.asarray(exact_run(queries)[1])[:, :k])
    mfu = exact_qps * 2.0 * dim * n / 394e12  # vs v5e bf16 peak
    stage = "2-stage bf16+f32" if ct is not None else "f32"
    log(f"exact ({stage}): {exact_qps:.0f} q/s, recall@{k} {exact_rec:.4f} "
        f"(~{100 * mfu:.0f}% of bf16 peak)")
    if exact_rec > 0.85:
        candidates.append((exact_qps, "exact", exact_rec))

    # headline: fastest mode that clears the reference recall bar
    if not candidates:
        candidates = [(exact_qps, "exact", exact_rec)]
    qps, mode, recall = max(candidates)
    log(f"headline mode: {mode} (recall {recall:.3f}) at N={n} "
        f"{data_kind}; build {build_rate:.0f} inserts/s")

    # machine-readable detail (VERDICT r2 #9): the driver records the
    # whole line, so the build bar and link conditions are visible to
    # future rounds, not just the headline qps
    print(json.dumps({
        "metric": "knn_qps_chip",
        "value": round(qps, 1),
        "unit": "queries/s",
        "vs_baseline": round(qps / 100_000, 4),
        "headline_mode": mode,
        "headline_recall": round(recall, 4),
        "build_inserts_per_s": round(build_rate, 1),
        "build_engine_inserts_per_s": round(engine_rate, 1),
        "build_upload_s": round(upload_s, 2),
        "build_vs_bar": round(build_rate / 10_000, 4),
        "build_engine_vs_bar": round(engine_rate / 10_000, 4),
        "h2d_link_mbps": round(h2d, 2),
        "ingest_ceiling_per_s": round(ceil, 1),
        "modes": {m: {"qps": round(q_, 1), "recall": round(r_, 4)}
                  for q_, m, r_ in candidates},
        "n": n, "dim": dim, "data": data_kind,
    }), flush=True)


if __name__ == "__main__":
    _watchdog(float(os.environ.get("BENCH_BUDGET_S", "3000")))
    main()
