"""TPU probe: exact_knn2 cost at 8.4M rows, compile vs steady state.

The full 8M build probe measured exact-mode queries at 47 q/s (1024
queries in ~22 s) where scaling from the 1M number predicts ~11k q/s.
This probe separates the suspects without an 80-minute build: the corpus
is generated ON DEVICE (an 8.4M-row host transfer would take hours
through the relay), then exact_knn2 is timed cold (includes compile) and
warm (chained reps, one final sync), for both the fused streaming scan
and the panel fallback.

Usage: PYTHONPATH=/root/repo python benchmarks/exact8m_probe.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from hnswindex_tpu.ops import distance as dst
from hnswindex_tpu.ops.bruteforce import exact_knn2

T_START = time.time()
BUDGET_S = float(os.environ.get("PROBE_BUDGET_S", "1200"))
C = int(os.environ.get("PC", str(8 << 20)))
D = 128
B = int(os.environ.get("PB", "1024"))
K = 10


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def budget():
    if time.time() - T_START > BUDGET_S:
        log("BUDGET EXHAUSTED - exiting cleanly")
        sys.exit(0)


log("devices:", jax.devices())
key = jax.random.PRNGKey(7)
vec = jax.random.normal(key, (C, D), jnp.float32)
coarse = vec.astype(jnp.bfloat16)
norms = dst.norm_data("sq_euclid", vec)
active = jnp.ones((C,), bool)
q = jnp.asarray(np.asarray(vec[:B]) + 0.01)
_ = np.asarray(norms[:1])
log(f"corpus ready: C={C} D={D} B={B}")
budget()


def run(tag, **kw):
    t0 = time.perf_counter()
    d, i = exact_knn2("sq_euclid", vec, coarse, norms, active, q, K, **kw)
    _ = np.asarray(i[:1, :1])
    cold = time.perf_counter() - t0
    budget()
    reps = 4
    t0 = time.perf_counter()
    for _ in range(reps):
        d, i = exact_knn2("sq_euclid", vec, coarse, norms, active, q, K,
                          **kw)
    _ = np.asarray(i[:1, :1])
    warm = (time.perf_counter() - t0) / reps
    log(f"{tag}: cold {cold:.2f}s, warm {warm:.3f}s -> {B / warm:.0f} q/s")
    budget()
    return warm


run("fused (auto gate)")
run("fused=False panel fallback", fused=False)
log("DONE")
