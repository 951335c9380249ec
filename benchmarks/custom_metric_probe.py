"""Custom-metric serving throughput at scale (VERDICT r4 #10).

Registered metrics have no dot decomposition, so they historically served
through the unpacked graph beam (row-gather-bound: 2.6k q/s at 1M).
Round 5 routes them through the packed engine (contiguous tile fetch +
elementwise VPU scoring — core/pack._entry_scan_custom + the custom
branch in packed_knn_search).  This probe measures both paths on the real
device.  Target: >= 10k q/s at 1M for a registered metric.

Run on a QUIET host: `BENCH_N=1000000 python benchmarks/custom_metric_probe.py`
"""
import json
import os
import sys
import threading
import time

import numpy as np


def bail():
    time.sleep(float(os.environ.get("PROBE_DEADLINE_S", "1500")))
    os._exit(9)


threading.Thread(target=bail, daemon=True).start()

import jax
import jax.numpy as jnp

from hnswindex_tpu import HNSWIndex, HNSWParameters, register_metric
from hnswindex_tpu.core.search import knn_search


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    n = int(os.environ.get("BENCH_N", "1000000"))
    dim = int(os.environ.get("BENCH_DIM", "128"))
    qb = int(os.environ.get("BENCH_QBATCH", "1024"))
    k = 10
    reps = 5

    register_metric(
        "l1_probe",
        lambda a, b: jnp.sum(jnp.abs(a - b), axis=-1))

    rng = np.random.default_rng(65537)
    centers = rng.random((max(2, n // 500), dim)).astype(np.float32)
    vecs = (centers[rng.integers(0, centers.shape[0], n)]
            + 0.03 * rng.standard_normal((n, dim)).astype(np.float32))

    p = HNSWParameters(collection_size=n, max_wave_size=512,
                       pack_queries="on")
    idx = HNSWIndex(dim, "l1_probe", parameters=p)
    t0 = time.perf_counter()
    idx.add(vecs)
    np.asarray(jnp.sum(idx._state.deg0))
    log(f"build (beam path, custom metric): {time.perf_counter()-t0:.0f}s")

    q = vecs[:qb]
    # L1 ground truth on a subsample of queries (host, chunked)
    gq = q[:256].astype(np.float64)
    gt = np.empty((256, k), np.int64)
    for i in range(0, 256, 32):
        d = np.abs(gq[i:i + 32, None, :]
                   - vecs[None, :, :].astype(np.float64)).sum(-1)
        part = np.argpartition(d, k, axis=1)[:, :k]
        rows = np.arange(part.shape[0])[:, None]
        gt[i:i + 32] = part[rows, np.argsort(d[rows, part], axis=1)]

    def recall_of(ids):
        return float(np.mean([
            len(set(ids[r].tolist()) & set(gt[r].tolist())) / k
            for r in range(gt.shape[0])]))

    out = {"n": n, "dim": dim, "metric": "l1(custom)"}
    for mode in ("packed", "unpacked"):
        idx.params.pack_queries = "on" if mode == "packed" else "off"
        idx._pack = None
        for ef in (16, 32):
            t0 = time.perf_counter()
            ids = idx._search_ids(q, ef, 0, None)
            log(f"{mode} ef={ef}: warm+compile "
                f"{time.perf_counter()-t0:.1f}s")
            t0 = time.perf_counter()
            for _ in range(reps):
                ids = idx._search_ids(q, ef, 0, None)
            qps = reps * qb / (time.perf_counter() - t0)
            rec = recall_of(ids[:256])
            log(f"{mode} ef={ef}: {qps:.0f} q/s, recall@{k} {rec:.3f}")
            out[f"{mode}_ef{ef}"] = {"qps": round(qps, 1),
                                     "recall": round(rec, 4)}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
