"""TPU probe: 8M-corpus single-chip build + serve.

Exercises the exact-MXU construction path at the scale bound set by HBM
(vectors 4GB + 7-level neighbor table 7.2GB at 128-d): builds 8M clustered
vectors, reports steady-state insert rate for the last million, then
measures exact-mode and graph-mode query throughput + recall@10.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/build8m_probe.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from hnswindex_tpu import HNSWIndex, HNSWParameters

PN = int(os.environ.get("PN", str(8 << 20)))
DIM = int(os.environ.get("PDIM", "128"))
NQ = 1024


def log(*a):
    print(*a, file=sys.stderr, flush=True)


log("devices:", jax.devices())
rng = np.random.default_rng(65537)
centers = rng.random((max(2, PN // 500), DIM)).astype(np.float32)


def make(n):
    return (centers[rng.integers(0, centers.shape[0], n)]
            + 0.03 * rng.standard_normal((n, DIM)).astype(np.float32))


params = HNSWParameters(collection_size=PN, max_wave_size=512,
                        allow_removals=True)
if "PTHRESH" in os.environ:   # 0 -> beam-path build throughout
    params.exact_build_threshold = int(os.environ["PTHRESH"])
idx = HNSWIndex(DIM, parameters=params)

t0 = time.perf_counter()
done = 0
CH = 1 << 20
qpool = None
while done < PN:
    n = min(CH, PN - done)
    chunk = make(n)
    if qpool is None:
        qpool = chunk[:NQ].copy()
    tc = time.perf_counter()
    idx.add(chunk)
    # block_until_ready is async-fake through the relay: force a real
    # sync with a tiny readback that depends on the last wave's writes
    _ = np.asarray(idx._state.deg0[:1])
    dt = time.perf_counter() - tc
    done += n
    log(f"  {done / 1e6:.0f}M: chunk {n} in {dt:.1f}s ({n / dt:.0f}/s)")
last_rate = n / dt
total = time.perf_counter() - t0
log(f"build: {PN} in {total:.1f}s (avg {PN / total:.0f}/s, "
    f"last-1M {last_rate:.0f}/s)")

# ground truth on a query subset via the index's own exact mode (recall 1.0
# by construction of the oracle; verified vs numpy at small scale in tests)
gids, t_exact = None, float("nan")
try:
    gids, _ = idx.knn_query(qpool, k=10, exact=True)  # warm the compile
    t0 = time.perf_counter()
    gids, _ = idx.knn_query(qpool, k=10, exact=True)  # synced np arrays
    t_exact = time.perf_counter() - t0
    log(f"exact query: {NQ / t_exact:.0f} q/s")
except Exception as e:   # HBM exhaustion at the top of the scale ladder
    log(f"exact oracle unavailable ({type(e).__name__}: {e}); "
        "falling back to self-recall@1")

for ef in (16, 32, 64, 128):
    idx.params.min_nn = ef
    t0 = time.perf_counter()
    ids, _ = idx.knn_query(qpool, k=10)
    t_g = time.perf_counter() - t0
    if gids is not None:
        rec = float(np.mean([len(set(a) & set(b)) / 10.0
                             for a, b in zip(ids, gids)]))
        log(f"graph ef={ef}: {NQ / t_g:.0f} q/s, recall@10 {rec:.3f}")
    else:
        # qpool is the first NQ indexed vectors: slots 0..NQ-1 in insert
        # order (fresh index, no frees)
        rec = float(np.mean(ids[:, 0] == np.arange(NQ)))
        log(f"graph ef={ef}: {NQ / t_g:.0f} q/s, self-recall@1 {rec:.3f}")

print(f'{{"build_rate_last1m": {last_rate:.0f}, '
      f'"build_total_s": {total:.1f}, '
      f'"build_avg": {PN / total:.0f}}}')
