"""TPU probe: accept-loop implementations at the real call-site shapes.

Times heuristic._accept_scan vs _accept_unroll on synthetic conflict
tensors at the three production shapes:
  (512, 100)  forward prune, W=512 wave, efC=100 candidates
  (16384, 40) reverse-edge overflow prune, W*2M rows, K+A candidates
  (1024, 80)  removal repair fast tier (chunked), K+SPAN_1 candidates
plus the full prune() under each mode at the forward-prune shape.

Usage: PYTHONPATH=/root/repo python benchmarks/accept_loop_probe.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from hnswindex_tpu.core import heuristic as H

T_START = time.time()
BUDGET_S = float(os.environ.get("PROBE_BUDGET_S", "420"))
R = int(os.environ.get("PR", "20"))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def out_of_time():
    if time.time() - T_START > BUDGET_S:
        log("BUDGET EXHAUSTED — exiting cleanly")
        return True
    return False


def bench(name, fn, *args, reps=R):
    if out_of_time():
        sys.exit(0)
    f = jax.jit(fn)
    o = f(*args)
    np.asarray(jax.tree_util.tree_leaves(o)[0].ravel()[:1])
    t0 = time.perf_counter()
    for _ in range(reps):
        o = f(*args)
    np.asarray(jax.tree_util.tree_leaves(o)[0].ravel()[:1])
    dt = (time.perf_counter() - t0) / reps * 1000
    log(f"  {name}: {dt:.2f} ms")
    return dt


log("devices:", jax.devices())
rng = np.random.default_rng(0)

for B, N, p in [(512, 100, 0.15), (16384, 40, 0.10), (1024, 80, 0.15)]:
    conf = rng.random((B, N, N)) < p
    tri = np.triu(np.ones((N, N), bool), k=1)
    conf_j = jnp.asarray(conf & tri[None])
    np.asarray(jnp.sum(conf_j))
    log(f"shape (B={B}, N={N}):")
    a = bench("scan  ", lambda c: jnp.sum(H._accept_scan(c)), conf_j)
    b = bench("unroll", lambda c: jnp.sum(H._accept_unroll(c)), conf_j)
    log(f"  -> unroll/scan = {b / a:.2f}x")

# full prune() at the forward shape under each mode
B, N, D = 512, 100, 128
vecs = rng.random((B, N, D)).astype(np.float32)
d = rng.random((B, N)).astype(np.float32)
ids = rng.integers(0, 1 << 20, (B, N)).astype(np.int32)
norms = (vecs ** 2).sum(-1).astype(np.float32)
args = (jnp.asarray(ids), jnp.asarray(d), jnp.asarray(vecs),
        jnp.asarray(norms))
for mode in ("scan", "unroll"):
    H.ACCEPT_MODE = mode
    bench(f"prune() (512,100)->32 [{mode}]",
          lambda i, dd, v, nn: H.prune("sq_euclid", i, dd, v, nn, 32),
          *args, reps=max(4, R // 2))
log("DONE")
