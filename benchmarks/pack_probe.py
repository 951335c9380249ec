"""TPU probe: packed vs unpacked graph serving at scale.

Run on the axon TPU:  python benchmarks/pack_probe.py
Env: PN (corpus size), PDIM, PDATA (clustered|uniform), PQ (batch).
"""
import os
import sys
import time

import numpy as np

N = int(os.environ.get("PN", "1000000"))
DIM = int(os.environ.get("PDIM", "128"))
DATA = os.environ.get("PDATA", "clustered")
QB = int(os.environ.get("PQ", "1024"))
K = 10
REPS = int(os.environ.get("PREPS", "8"))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from hnswindex_tpu import HNSWIndex, HNSWParameters
from hnswindex_tpu.core.search import knn_search
from hnswindex_tpu.core.pack import packed_knn_search
from hnswindex_tpu.ops.bruteforce import exact_knn

log("devices:", jax.devices())
rng = np.random.default_rng(65537)
if DATA == "clustered":
    centers = rng.random((max(2, N // 500), DIM)).astype(np.float32)
    vecs = (centers[rng.integers(0, centers.shape[0], N)]
            + 0.03 * rng.standard_normal((N, DIM)).astype(np.float32))
else:
    vecs = rng.random((N, DIM), dtype=np.float32)

params = HNSWParameters(collection_size=N, max_wave_size=512)
idx = HNSWIndex(DIM, parameters=params)
t0 = time.perf_counter()
idx.add(vecs)
jax.block_until_ready(idx._state.nbr0)
log(f"build {time.perf_counter() - t0:.1f}s")

cfg = idx._cfg
state = idx._state
queries = jnp.asarray(vecs[:QB])

gt = np.asarray(exact_knn(cfg.metric, state.vectors, state.norms,
                          state.active, queries, K)[1])


def recall_of(ids):
    return float(np.mean([
        len(set(ids[r].tolist()) & set(gt[r].tolist())) / K
        for r in range(ids.shape[0])]))


def throughput(run):
    np.asarray(run(queries)[1])
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = run(queries)
    np.asarray(out[1])
    return REPS * QB / (time.perf_counter() - t0)


t0 = time.perf_counter()
pk = idx._get_pack()
jax.block_until_ready(pk.res)
log(f"pack build {time.perf_counter() - t0:.1f}s, dtype={pk.res.dtype}, "
    f"entry set S={pk.entry_ids.shape[0]}")

for ef in (16, 32, 64, 128):
    for expand in (4, 8):
        mi = (cfg.search_iter_factor * ef) // expand + 16

        def prun(qs, ef=ef, mi=mi, expand=expand):
            return packed_knn_search(cfg, pk, qs, ef, mi, expand=expand,
                                     n_entry=min(8, ef))

        qps = throughput(prun)
        rec = recall_of(np.asarray(prun(queries)[1])[:, :K])
        log(f"packed ef={ef} expand={expand}: {qps:.0f} q/s, "
            f"recall@{K} {rec:.3f}")

for ef in (64,):
    expand = 4
    mi = (cfg.search_iter_factor * ef) // expand + 16

    def grun(qs, ef=ef, mi=mi):
        return knn_search(cfg, state, qs, 0, ef, mi, expand=expand)

    qps = throughput(grun)
    rec = recall_of(np.asarray(grun(queries)[1])[:, :K])
    log(f"unpacked ef={ef}: {qps:.0f} q/s, recall@{K} {rec:.3f}")


def erun(qs):
    return exact_knn(cfg.metric, state.vectors, state.norms, state.active,
                     qs, K)

log(f"exact: {throughput(erun):.0f} q/s")
