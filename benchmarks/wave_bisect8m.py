"""TPU probe: per-phase wave cost in the 8.4M-row regime, in minutes.

Builds a SMALL graph inside an 8.4M-capacity index, then raises the
exact-scan high-water mark to the full capacity: the scan prefix (the only
corpus-size-dependent cost — every connect/prune kernel is shape-static)
then matches a mature 8.4M build, so per-wave phase costs measured here
reproduce steady state without a 40-minute build.  Inactive rows beyond
the seeded graph are masked out of the scan by `active`, so results stay
correct.

Usage: PYTHONPATH=/root/repo python benchmarks/wave_bisect8m.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from hnswindex_tpu import HNSWIndex, HNSWParameters

T_START = time.time()
BUDGET_S = float(os.environ.get("PROBE_BUDGET_S", "900"))
# NOTE: capacities above 8192 round UP to the next 8192-row multiple
# (index.py _alloc_capacity) — 8.4 * 2**20 would allocate ~8.81M rows,
# which fits.  PCAP stays pinned to 8 << 20 so phase costs remain
# comparable with the recorded 8M measurements (benchmarks/RESULTS.md).
CAP = int(os.environ.get("PCAP", str(8 << 20)))
SEED_N = int(os.environ.get("PSEED", str(256 * 1024)))
DIM = 128
W = int(os.environ.get("PW", "512"))
R = int(os.environ.get("PR", "8"))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def checkpoint(name):
    log(f"[{time.time() - T_START:.0f}s] {name}")
    if time.time() - T_START > BUDGET_S:
        log("BUDGET EXHAUSTED — exiting cleanly")
        sys.exit(0)


log("devices:", jax.devices())
rng = np.random.default_rng(31337)
centers = rng.random((2048, DIM)).astype(np.float32)


def make(n):
    return (centers[rng.integers(0, centers.shape[0], n)]
            + 0.03 * rng.standard_normal((n, DIM)).astype(np.float32))


params = HNSWParameters(collection_size=CAP, max_wave_size=W)
idx = HNSWIndex(DIM, parameters=params)
t0 = time.perf_counter()
idx.add(make(SEED_N))
_ = np.asarray(idx._state.deg0[:1])
checkpoint(f"seed {SEED_N} in {time.perf_counter() - t0:.1f}s")

# jump to the mature-scan regime
idx._scan_hwm = CAP
st = idx._state
cfg = idx._cfg


def _sync(o):
    leaf = jax.tree_util.tree_leaves(o)[0]
    _ = np.asarray(leaf.ravel()[:1])


def timed(name, fn, *args, warm=2, reps=R):
    """Time a chained device program: warm compiles, then reps back to
    back with ONE final sync (block_until_ready is async-fake here)."""
    if time.time() - T_START > BUDGET_S:
        log("BUDGET EXHAUSTED — exiting cleanly")
        sys.exit(0)
    for _ in range(warm):
        o = fn(*args)
    _sync(o)
    t0 = time.perf_counter()
    for _ in range(reps):
        o = fn(*args)
    _sync(o)
    dt = (time.perf_counter() - t0) / reps * 1000
    log(f"  {name}: {dt:.1f} ms")
    return dt


# ---- full wave (compile + steady) ------------------------------------
chunk = make(16 * W)
t0 = time.perf_counter()
idx.add(chunk[:W])
_ = np.asarray(idx._state.deg0[:1])
checkpoint(f"first 8.4M-regime wave (incl. compile): "
           f"{time.perf_counter() - t0:.1f}s")

t0 = time.perf_counter()
idx.add(chunk[W:])
_ = np.asarray(idx._state.deg0[:1])
dt = time.perf_counter() - t0
n = 15 * W
log(f"steady waves: {n} inserts in {dt:.2f}s -> {n / dt:.0f}/s "
    f"({dt / 15 * 1000:.0f} ms/wave)")
checkpoint("steady waves done")

# ---- standalone phases ------------------------------------------------
from hnswindex_tpu.ops.bruteforce import exact_knn2
from hnswindex_tpu.core import heuristic
from hnswindex_tpu.core.construct import _prune_rows

st = idx._state
q = jnp.asarray(make(W))
nscan = CAP

timed("exact_knn2 fused (512 x 8.4M) efC=100",
      lambda: exact_knn2(cfg.metric, st.vectors, st.coarse_table[:nscan],
                         st.norms[:nscan], st.active[:nscan], q,
                         cfg.ef_construction, survivor_floor=64))
checkpoint("scan timed")

# forward prune: (512, efC=100) -> 32
ci = jnp.asarray(rng.integers(0, SEED_N, (W, cfg.ef_construction)),
                 dtype=jnp.int32)
cd = jnp.asarray(rng.random((W, cfg.ef_construction), np.float32))
cvecs = st.vlo[ci]
cnorms = st.norms[ci]
timed("heuristic.prune (512,100)->32",
      lambda: heuristic.prune(cfg.metric, ci, cd, cvecs, cnorms, 32))
checkpoint("fwd prune timed")

# reverse overflow prune: (16384, 40) -> 32 gated at ~60% rows
P = W * 32
t_ids = jnp.asarray(rng.integers(0, SEED_N, (P,)), dtype=jnp.int32)
c_ids = jnp.asarray(rng.integers(0, SEED_N, (P, 40)), dtype=jnp.int32)
gate = jnp.asarray(rng.random(P) < 0.6)
timed("_prune_rows (16384,40)->32 gate60%",
      lambda: _prune_rows(cfg, st.vlo, st.norms, t_ids, c_ids, gate, 32),
      warm=1, reps=max(2, R // 2))
checkpoint("reverse prune timed")

# scatter-only baseline: wave scatter phase.  scatter_wave donates the
# state, so reassign idx._state on every call to keep buffers live; with
# valid=False the writes drop, leaving the graph unchanged.
from hnswindex_tpu.core.construct import scatter_wave
wid = jnp.arange(SEED_N + 64, SEED_N + 64 + W, dtype=jnp.int32)
wlvl = jnp.zeros((W,), jnp.int32)
novalid = jnp.zeros((W,), bool)


def _scat():
    idx._state = scatter_wave(cfg, idx._state, wid, q, wlvl, novalid)
    return idx._state.deg0


timed("scatter_wave (masked writes)", _scat, warm=1, reps=max(2, R // 2))
log("DONE")
