"""Recall-vs-throughput sweep across serving modes.

Produces a markdown table (stdout or --out) in the style of standard ANN
benchmarks: for each mode and quality knob, batched queries/sec against
measured recall@k vs float64 ground truth.

Usage:
  python benchmarks/sweep.py [--n 100000] [--dim 128] [--data uniform|clustered]
                             [--metric sq_euclid] [--k 10] [--batch 1024]
                             [--out benchmarks/RESULTS.md]
"""

import argparse
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100000)
    ap.add_argument("--dim", type=int, default=128)
    ap.add_argument("--data", default="uniform",
                    choices=["uniform", "clustered"])
    ap.add_argument("--metric", default="sq_euclid")
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from hnswindex_tpu import BlockIndex, HNSWIndex, HNSWParameters
    from hnswindex_tpu.core.search import knn_search
    from hnswindex_tpu.ops.bruteforce import exact_knn

    rng = np.random.default_rng(65537)
    if args.data == "clustered":
        centers = rng.random((max(2, args.n // 500), args.dim)) \
            .astype(np.float32)
        vecs = (centers[rng.integers(0, centers.shape[0], args.n)]
                + 0.03 * rng.standard_normal(
                    (args.n, args.dim)).astype(np.float32))
    else:
        vecs = rng.random((args.n, args.dim), dtype=np.float32)

    params = HNSWParameters(collection_size=args.n, max_wave_size=512)
    idx = HNSWIndex(args.dim, args.metric, parameters=params)
    t0 = time.perf_counter()
    idx.add(vecs)
    jax.block_until_ready(idx._state.nbr0)
    build_s = time.perf_counter() - t0

    bix = BlockIndex(args.dim, args.metric, parameters=params)
    t0 = time.perf_counter()
    bix.build(vecs)
    block_build_s = time.perf_counter() - t0

    queries = jnp.asarray(vecs[:args.batch])
    cfg, state = idx._cfg, idx._state
    k = args.k

    # float64 ground truth
    qh = vecs[:args.batch].astype(np.float64)
    vh = vecs.astype(np.float64)
    vn2 = (vh * vh).sum(1)
    gt = np.empty((args.batch, k), np.int64)
    for s in range(0, args.batch, 128):
        qs_ = qh[s:s + 128]
        d = (qs_ * qs_).sum(1)[:, None] + vn2[None, :] - 2.0 * qs_ @ vh.T
        part = np.argpartition(d, k, axis=1)[:, :k]
        r = np.arange(part.shape[0])[:, None]
        gt[s:s + 128] = part[r, np.argsort(d[r, part], axis=1)]

    def recall_of(ids):
        return float(np.mean([
            len(set(ids[r].tolist()) & set(gt[r].tolist())) / k
            for r in range(ids.shape[0])]))

    def throughput(run):
        d, i = run(queries)
        np.asarray(i)
        t0 = time.perf_counter()
        for _ in range(args.reps):
            d, i = run(queries)
        np.asarray(i)
        return args.reps * args.batch / (time.perf_counter() - t0)

    rows = []
    expand = max(1, params.query_expand)
    for ef in (10, 16, 32, 64, 128, 256):
        mi = (cfg.search_iter_factor * ef) // expand + 16

        def run(qs, ef=ef, mi=mi):
            return knn_search(cfg, state, qs, 0, ef, mi, expand=expand)

        qps = throughput(run)
        rec = recall_of(np.asarray(run(queries)[1])[:, :k])
        rows.append((f"graph ef={ef}", qps, rec))
        log(rows[-1])

    for npb in (4, 8, 16, 32, 64, 128):
        if npb > bix.n_blocks:
            continue

        def run(qs, npb=npb):
            return bix.query_device(qs, k, n_probe=npb)

        qps = throughput(run)
        rec = recall_of(np.asarray(run(queries)[1])[:, :k])
        rows.append((f"block n_probe={npb}", qps, rec))
        log(rows[-1])

    def exact_run(qs):
        return exact_knn(cfg.metric, state.vectors, state.norms,
                         state.active, qs, k)

    qps = throughput(exact_run)
    rec = recall_of(np.asarray(exact_run(queries)[1])[:, :k])
    rows.append(("exact", qps, rec))
    log(rows[-1])

    dev = str(jax.devices()[0])
    lines = [
        f"# Sweep: n={args.n} dim={args.dim} data={args.data} "
        f"metric={args.metric} k={k} batch={args.batch}",
        "",
        f"- device: {dev}",
        f"- graph build: {build_s:.1f}s "
        f"({args.n / build_s:.0f} inserts/s incl. compile)",
        f"- block build: {block_build_s:.1f}s ({bix.n_blocks} blocks)",
        "",
        "| mode | queries/s | recall@%d |" % k,
        "|---|---|---|",
    ]
    for name, qps, rec in rows:
        lines.append(f"| {name} | {qps:,.0f} | {rec:.3f} |")
    text = "\n".join(lines) + "\n"
    if args.out:
        with open(args.out, "a") as f:
            f.write(text + "\n")
    print(text)


if __name__ == "__main__":
    main()
