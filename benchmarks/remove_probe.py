"""Measure removal throughput on the live backend.

Builds an index, removes a fraction of it in big waves, and reports
removals/s plus the survivors' self-recall drift across the removal
(pre vs post at the same ef) — the reference's quality bar is drift,
not an absolute recall level (GraphTests.cs:138-148).

Usage: PYTHONPATH=/root/repo:/root/.axon_site \
           python benchmarks/remove_probe.py [N] [REMOVE_FRAC] [DATA]
"""

import os
import sys
import time

import numpy as np

from hnswindex_tpu import HNSWIndex, HNSWParameters


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    frac = float(sys.argv[2]) if len(sys.argv) > 2 else 0.5
    kind = sys.argv[3] if len(sys.argv) > 3 else "uniform"
    dim = 128
    rng = np.random.default_rng(0)
    if kind == "clustered":
        centers = rng.random((max(2, n // 500), dim)).astype(np.float32)
        vecs = (centers[rng.integers(0, centers.shape[0], n)]
                + 0.03 * rng.standard_normal((n, dim)).astype(np.float32))
    else:
        vecs = rng.random((n, dim), dtype=np.float32)

    idx = HNSWIndex(dim, parameters=HNSWParameters(collection_size=n))
    idx.params.min_nn = int(os.environ.get("PROBE_EF", "16"))
    # quality/cost sweep knobs (REPAIR_SPAN/_1/FANIN ride HNSW_REPAIR_*
    # env vars read by core.remove at import)
    idx.params.remove_max_candidates = int(
        os.environ.get("REMOVE_EF", idx.params.remove_max_candidates))
    t0 = time.perf_counter()
    ids = idx.add(vecs)
    t1 = time.perf_counter()
    print(f"build: {n} in {t1 - t0:.1f}s ({n / (t1 - t0):.0f}/s)",
          file=sys.stderr)

    drop = rng.choice(ids, size=int(n * frac), replace=False)
    keep = np.setdiff1d(ids, drop)
    sub = rng.choice(keep, size=min(2000, keep.size), replace=False)

    qi, _ = idx.knn_query(vecs[sub], k=1)
    pre = float((qi[:, 0] == sub).mean())
    print(f"pre-removal self-recall@1: {pre:.3f}", file=sys.stderr)

    # warmup wave compiles every (bucket, tier, layer, chunk) kernel
    warm = drop[:4600]
    rest = drop[4600:]
    t2 = time.perf_counter()
    idx.remove(warm)
    t3 = time.perf_counter()
    print(f"warmup remove: {warm.size} in {t3 - t2:.1f}s (incl. compiles)",
          file=sys.stderr)
    t2 = time.perf_counter()
    idx.remove(rest)
    t3 = time.perf_counter()
    rate = rest.size / (t3 - t2)
    print(f"remove: {rest.size} in {t3 - t2:.1f}s ({rate:.0f}/s)",
          file=sys.stderr)

    qi, _ = idx.knn_query(vecs[sub], k=1)
    post = float((qi[:, 0] == sub).mean())
    print(f"post-removal self-recall@1: {post:.3f} (drift {post - pre:+.3f})",
          file=sys.stderr)
    print(f'{{"removals_per_s": {rate:.1f}, "pre_recall": {pre:.4f}, '
          f'"post_recall": {post:.4f}}}')


if __name__ == "__main__":
    main()
