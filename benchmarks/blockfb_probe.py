"""TPU probe: the facade's at-scale block-serving fallback.

The round-3 hole (VERDICT weak #3): above the pack HBM budget, plain
``HNSWIndex.knn_query`` fell back to the unpacked beam at ~150 q/s.  This
probe builds a corpus, FORCES the fallback regime (pack budget 0 unless
PFB_REAL=1, where the real 8M-scale budget refusal triggers it), and
measures qps + recall@10 of plain knn_query through the device-built
block tables against exact ground truth.

Usage (quiet host!):
  PN=$((2<<20)) python benchmarks/blockfb_probe.py          # forced, 2M
  PN=$((8<<20)) PFB_REAL=1 python benchmarks/blockfb_probe.py  # real 8M
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from hnswindex_tpu import HNSWIndex, HNSWParameters

PN = int(os.environ.get("PN", str(2 << 20)))
DIM = int(os.environ.get("PDIM", "128"))
NQ = 1024
REPS = int(os.environ.get("PREPS", "10"))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


log("devices:", jax.devices())
rng = np.random.default_rng(65537)
centers = rng.random((max(2, PN // 500), DIM)).astype(np.float32)


def make(n):
    return (centers[rng.integers(0, centers.shape[0], n)]
            + 0.03 * rng.standard_normal((n, DIM)).astype(np.float32))


params = HNSWParameters(collection_size=PN, max_wave_size=512)
if os.environ.get("PFB_REAL") != "1":
    params.pack_max_bytes = 0        # force the fallback regime
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
    idx.add(chunk)
    _ = np.asarray(idx._state.deg0[:1])
    done += n
    log(f"built {done / (1 << 20):.1f}M at "
        f"{done / (time.perf_counter() - t0):.0f}/s avg")

# ground truth: device exact scan
from hnswindex_tpu.ops.bruteforce import exact_knn2

st = idx._state
qj = jnp.asarray(qpool)
gt = np.asarray(exact_knn2(idx.metric, st.vectors, st.coarse_table,
                           st.norms, st.active, qj, 10)[1])

t0 = time.perf_counter()
ids, d = idx.knn_query(qpool, 10)
log(f"first fallback query (incl. table build + compiles): "
    f"{time.perf_counter() - t0:.1f}s")
assert idx._block_fb is not None, "fallback did not engage"
log(f"tables: {idx._block_fb.n_blocks} blocks, dtype "
    f"{idx._block_fb.blk_vecs.dtype}")

rec = float(np.mean([len(set(ids[r].tolist()) & set(gt[r].tolist())) / 10
                     for r in range(NQ)]))
t0 = time.perf_counter()
for _ in range(REPS):
    ids, d = idx.knn_query(qpool, 10)
qps = REPS * NQ / (time.perf_counter() - t0)
log(f"fallback serve (host path): {qps:.0f} q/s, recall@10 {rec:.3f} "
    f"at N={PN}  [per-call relay RTT bound: one query upload + one "
    f"result sync per batch costs 30-130 ms through the tunnel]")

# device-resident sweep (the engine number, same convention as bench.py's
# block mode): queries already on device, REPS chained calls, one sync
from hnswindex_tpu.block import device_block_query

fb = idx._block_fb
for npb in (8, 12, 16, 24, 32, 48):
    if npb > fb.n_blocks:
        continue
    di, = (device_block_query(idx.metric, fb, qj, 10, npb, True)[1],)
    np.asarray(di)
    t0 = time.perf_counter()
    for _ in range(REPS):
        di = device_block_query(idx.metric, fb, qj, 10, npb, True)[1]
    np.asarray(di)
    dqps = REPS * NQ / (time.perf_counter() - t0)
    ids_np = np.asarray(di)
    drec = float(np.mean([
        len(set(ids_np[r, :10].tolist()) & set(gt[r].tolist())) / 10
        for r in range(NQ)]))
    # refined ceiling: recall after a perfect re-rank of the whole panel
    crec = float(np.mean([
        len(set(ids_np[r].tolist()) & set(gt[r].tolist())) / 10
        for r in range(NQ)]))
    log(f"device-resident n_probe={npb}: {dqps:.0f} q/s, raw recall@10 "
        f"{drec:.3f}, refined-ceiling {crec:.3f} (panel {ids_np.shape[1]})")

print(f'{{"probe": "blockfb", "n": {PN}, "qps": {qps:.1f}, '
      f'"recall": {rec:.4f}}}')
