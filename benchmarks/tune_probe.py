"""TPU tuning probe: packed-search parameter sweep + removal throughput."""
import os
import sys
import time

import numpy as np

N = int(os.environ.get("PN", "1000000"))
DIM = int(os.environ.get("PDIM", "128"))
DATA = os.environ.get("PDATA", "clustered")
K = 10


def log(*a):
    print(*a, file=sys.stderr, flush=True)


import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from hnswindex_tpu import HNSWIndex, HNSWParameters
from hnswindex_tpu.core import pack as PK
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

lvl = np.asarray(state.level)
act = np.asarray(state.active)


def make_pack(min_level):
    eids = np.flatnonzero((lvl >= min_level) & act)
    S = 1 << max(0, int(eids.size - 1).bit_length())
    padded = np.full(S, -1, np.int64)
    padded[:eids.size] = eids
    return PK.make_query_pack(cfg, state, jnp.asarray(padded, jnp.int32))


pk1 = make_pack(1)
jax.block_until_ready(pk1.res)
log(f"pack L1: S={pk1.entry_ids.shape[0]}")

QB = 1024
queries = jnp.asarray(vecs[:QB])
gt = np.asarray(exact_knn(cfg.metric, state.vectors, state.norms,
                          state.active, queries, K)[1])


def recall_of(ids):
    return float(np.mean([
        len(set(ids[r].tolist()) & set(gt[r].tolist())) / K
        for r in range(ids.shape[0])]))


def throughput(run, q, reps=8):
    np.asarray(run(q)[1])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = run(q)
    np.asarray(out[1])
    return reps * q.shape[0] / (time.perf_counter() - t0)


# --- sweep: ef x expand at L1 entries
for ef in (8, 12, 16, 24):
    for P in (1, 2, 4):
        mi = (cfg.search_iter_factor * ef) // P + 16

        def run(qs, ef=ef, mi=mi, P=P):
            return PK.packed_knn_search(cfg, pk1, qs, ef, mi, expand=P,
                                        n_entry=min(8, ef))

        qps = throughput(run, queries)
        rec = recall_of(np.asarray(run(queries)[1])[:, :K])
        log(f"L1 ef={ef} P={P}: {qps:.0f} q/s, recall@{K} {rec:.3f}")

# --- n_entry effect at ef=16 P=2
for ne in (2, 4, 8, 16):
    mi = (cfg.search_iter_factor * 16) // 2 + 16

    def run(qs, ne=ne):
        return PK.packed_knn_search(cfg, pk1, qs, 16, mi, expand=2,
                                    n_entry=ne)

    qps = throughput(run, queries)
    rec = recall_of(np.asarray(run(queries)[1])[:, :K])
    log(f"L1 ef=16 P=2 n_entry={ne}: {qps:.0f} q/s, recall {rec:.3f}")

# --- entry set level 2 (smaller scan)
pk2 = make_pack(2)
jax.block_until_ready(pk2.entry_vecs)
log(f"pack L2: S={pk2.entry_ids.shape[0]}")
for ef in (16, 24):
    mi = (cfg.search_iter_factor * ef) // 2 + 16

    def run(qs, ef=ef, mi=mi):
        return PK.packed_knn_search(cfg, pk2, qs, ef, mi, expand=2,
                                    n_entry=8)

    qps = throughput(run, queries)
    rec = recall_of(np.asarray(run(queries)[1])[:, :K])
    log(f"L2 ef={ef} P=2: {qps:.0f} q/s, recall {rec:.3f}")

# --- batch size scaling at ef=16 P=2
for qb in (2048, 4096):
    qq = jnp.asarray(vecs[:qb])
    mi = (cfg.search_iter_factor * 16) // 2 + 16

    def run(qs):
        return PK.packed_knn_search(cfg, pk1, qs, 16, mi, expand=2,
                                    n_entry=8)

    qps = throughput(run, qq)
    log(f"L1 ef=16 P=2 B={qb}: {qps:.0f} q/s")

# --- entry scan fixed cost
@jax.jit
def entry_only(qs):
    qn = jnp.sum(qs * qs, axis=1)
    return PK._entry_scan(cfg, pk1, qs, qn, 8)

np.asarray(entry_only(queries)[1])
t0 = time.perf_counter()
for _ in range(20):
    out = entry_only(queries)
np.asarray(out[1])
log(f"entry scan L1: {(time.perf_counter() - t0) / 20 * 1e3:.2f} ms/batch")

# --- removal throughput at 1M
del pk1, pk2
ids_all = np.arange(N, dtype=np.int32)
drop = rng.choice(ids_all, size=50_000, replace=False)
t0 = time.perf_counter()
idx.remove(drop)
jax.block_until_ready(idx._state.nbr0)
dt = time.perf_counter() - t0
log(f"remove 50k @1M: {dt:.1f}s = {50_000 / dt:.0f} removals/s")
keep = np.setdiff1d(ids_all[:2000], drop)
ri, _ = idx.knn_query(vecs[keep], k=1)
log(f"post-removal self-recall: {(ri[:, 0] == keep).mean():.3f}")
