"""Benchmark: build + batched k-NN query throughput on one chip.

Prints ONE JSON line:
  {"metric": "knn_qps_chip", "value": <qps>, "unit": "queries/s",
   "vs_baseline": <qps / 100_000>}

The baseline divisor is the driver-set north star (BASELINE.json):
>= 100k queries/sec/chip batched on v5e.  Extra context (build rate,
recall@10 vs brute force) goes to stderr.
"""

import json
import os
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    n = int(os.environ.get("BENCH_N", "100000"))
    dim = int(os.environ.get("BENCH_DIM", "128"))
    q_batch = int(os.environ.get("BENCH_QBATCH", "1024"))
    k = int(os.environ.get("BENCH_K", "10"))

    import jax
    log("devices:", jax.devices())

    from hnswindex_tpu import HNSWIndex, HNSWParameters
    from hnswindex_tpu.core.search import knn_search
    import jax.numpy as jnp

    rng = np.random.default_rng(65537)
    vecs = rng.random((n, dim), dtype=np.float32)

    params = HNSWParameters(collection_size=n, max_wave_size=512)
    idx = HNSWIndex(dim, parameters=params)

    t0 = time.perf_counter()
    ids = idx.add(vecs)
    jax.block_until_ready(idx._state.nbr)
    build_s = time.perf_counter() - t0
    log(f"build: {n} items in {build_s:.1f}s = {n / build_s:.0f} inserts/s")

    # query throughput (compiled, steady-state)
    cfg = idx._cfg
    ef = max(params.min_nn, k)
    expand = max(1, params.query_expand)
    max_iters = (cfg.search_iter_factor * ef) // expand + 16
    queries = jnp.asarray(vecs[:q_batch])

    def run(qs):
        return knn_search(cfg, idx._state, qs, 0, ef, max_iters,
                          expand=expand)

    d, i = run(queries)
    jax.block_until_ready(i)  # warm-up / compile
    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        d, i = run(queries)
    jax.block_until_ready(i)
    dt = time.perf_counter() - t0
    qps = iters * q_batch / dt
    log(f"query: {qps:.0f} q/s (batch {q_batch}, ef {ef})")

    # recall@10 vs brute force on a query sample
    sample = rng.choice(n, 256, replace=False)
    qs = vecs[sample]
    got = np.asarray(i)[:0]  # placeholder
    ids10 = idx.knn_query(qs, k)[0]
    d_bf = ((qs[:, None, :] - vecs[None, :, :]) ** 2).sum(-1) \
        if n <= 200000 else None
    if d_bf is not None:
        bf = np.argsort(d_bf, axis=1)[:, :k]
        recall = np.mean([
            len(set(ids10[r].tolist()) & set(bf[r].tolist())) / k
            for r in range(qs.shape[0])])
        log(f"recall@{k} vs brute force: {recall:.3f}")

    print(json.dumps({
        "metric": "knn_qps_chip",
        "value": round(qps, 1),
        "unit": "queries/s",
        "vs_baseline": round(qps / 100_000, 4),
    }), flush=True)


if __name__ == "__main__":
    main()
