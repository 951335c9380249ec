"""Custom-metric serving throughput at scale (VERDICT r4 #10).

Registered metrics have no dot decomposition, so they historically served
through the unpacked graph beam (row-gather-bound: 2.6k q/s at 1M).
Round 5 routes them through the packed engine (contiguous tile fetch +
elementwise VPU scoring — core/pack._entry_scan_custom + the custom
branch in packed_knn_search).  This probe measures both custom-metric
serving paths on the real device at 1M.

Method note: the graph is BUILT under sq_euclid (the exact-MXU build
path) and SERVED under a registered L1 metric.  This isolates the
serving engines — the probe's target — because a 1M *build* under a
custom metric runs on beam waves and exceeded a 40-minute deadline
(recorded in RESULTS.md).  The pack's tiles (residuals + raw base
vectors) are metric-independent for non-cosine metrics, so the served
pack is exactly what a custom-metric build would produce; recall is
scored against true L1 ground truth, so any graph-shape mismatch
shows up there honestly.

Run on a QUIET host: `BENCH_N=1000000 python benchmarks/custom_metric_probe.py`
"""
import dataclasses
import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def bail():
    time.sleep(float(os.environ.get("PROBE_DEADLINE_S", "1500")))
    print(json.dumps({"error": "deadline"}), flush=True)
    os._exit(9)


threading.Thread(target=bail, daemon=True).start()

import jax
import jax.numpy as jnp

from hnswindex_tpu import HNSWIndex, HNSWParameters, register_metric
from hnswindex_tpu.core import pack as PK
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
    idx = HNSWIndex(dim, "sq_euclid", parameters=p)
    t0 = time.perf_counter()
    idx.add(vecs)
    np.asarray(jnp.sum(idx._state.deg0))
    log(f"build (sq_euclid exact path): {time.perf_counter()-t0:.0f}s")

    # flip the facade's metric BEFORE the pack builds so entry-set
    # selection takes the custom path (PK.entry_scan_cap: the elementwise
    # entry scan needs the smaller high-level set; tile contents are
    # metric-independent for non-cosine metrics)
    idx.metric = "l1_probe"
    pk = idx._get_pack()
    assert pk is not None
    jax.block_until_ready(pk.res)
    log(f"custom pack entry set: {int(pk.entry_ids.shape[0])}")
    cfg_c = dataclasses.replace(idx._cfg, metric="l1_probe")

    q = jnp.asarray(vecs[:qb])
    # L1 ground truth on a subsample of queries: running top-k over
    # corpus chunks (a broadcast (Q, N, D) f64 intermediate is 32 GB at
    # 1M — the first version of this probe stalled the host on exactly
    # that)
    NQ = 256
    QCH, CH = 64, 1 << 14          # (64, 16k, 128) f32 ~ 0.5 GB temps
    gt = np.empty((NQ, k), np.int64)
    for q0 in range(0, NQ, QCH):
        gq = vecs[q0:q0 + QCH].astype(np.float32)
        bd = np.full((QCH, k), np.inf, np.float64)
        bi = np.full((QCH, k), -1, np.int64)
        rows = np.arange(QCH)[:, None]
        for c0 in range(0, n, CH):
            blk = vecs[c0:c0 + CH].astype(np.float32)
            d = np.abs(gq[:, None, :] - blk[None, :, :]).sum(
                -1, dtype=np.float64)
            part = np.argpartition(d, min(k, d.shape[1] - 1),
                                   axis=1)[:, :k]
            md = np.concatenate([bd, d[rows, part]], axis=1)
            mi_ = np.concatenate([bi, part + c0], axis=1)
            o = np.argsort(md, axis=1, kind="stable")[:, :k]
            bd, bi = md[rows, o], mi_[rows, o]
        gt[q0:q0 + QCH] = bi
    log("L1 ground truth done")

    def recall_of(ids):
        return float(np.mean([
            len(set(ids[r].tolist()) & set(gt[r].tolist())) / k
            for r in range(gt.shape[0])]))

    out = {"n": n, "dim": dim, "metric": "l1(custom)"}
    expand = 4
    for mode in ("packed", "unpacked"):
        for ef in (16, 32):
            mi = (cfg_c.search_iter_factor * ef) // expand + 16

            def run(ef=ef, mi=mi, mode=mode):
                if mode == "packed":
                    return PK.packed_knn_search(cfg_c, pk, q, ef, mi,
                                                expand=expand, n_entry=8)
                return knn_search(cfg_c, idx._state, q, 0, ef, mi,
                                  expand=expand)

            t0 = time.perf_counter()
            _, ids = run()
            np.asarray(ids)
            log(f"{mode} ef={ef}: warm+compile "
                f"{time.perf_counter()-t0:.1f}s")
            t0 = time.perf_counter()
            for _ in range(reps):
                _, ids = run()
            ids = np.asarray(ids)
            qps = reps * qb / (time.perf_counter() - t0)
            rec = recall_of(ids[:256])
            log(f"{mode} ef={ef}: {qps:.0f} q/s, recall@{k} {rec:.3f}")
            out[f"{mode}_ef{ef}"] = {"qps": round(qps, 1),
                                     "recall": round(rec, 4)}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
