"""TPU probe: beam-path construction (beyond the exact threshold).

Builds PN vectors with exact_build_threshold=0 (pure beam construction),
measures the steady insert rate, then ablates one wave into its phases.
"""
import os
import sys
import time

import numpy as np

PN = int(os.environ.get("PN", "500000"))
DIM = int(os.environ.get("PDIM", "128"))
DATA = os.environ.get("PDATA", "clustered")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from hnswindex_tpu import HNSWIndex, HNSWParameters
from hnswindex_tpu.core import graph as G
from hnswindex_tpu.core.construct import (base_connect, scatter_wave,
                                          upper_connect)
from hnswindex_tpu.core.search import beam_search

log("devices:", jax.devices())
rng = np.random.default_rng(65537)
if DATA == "clustered":
    centers = rng.random((max(2, PN // 500), DIM)).astype(np.float32)
    vecs = (centers[rng.integers(0, centers.shape[0], PN)]
            + 0.03 * rng.standard_normal((PN, DIM)).astype(np.float32))
else:
    vecs = rng.random((PN, DIM), dtype=np.float32)

params = HNSWParameters(collection_size=PN, max_wave_size=512,
                        exact_build_threshold=0)
idx = HNSWIndex(DIM, parameters=params)
t0 = time.perf_counter()
idx.add(vecs[: PN // 2])
jax.block_until_ready(idx._state.nbr0)
log(f"warm half: {time.perf_counter() - t0:.1f}s")
t0 = time.perf_counter()
idx.add(vecs[PN // 2:])
jax.block_until_ready(idx._state.nbr0)
dt = time.perf_counter() - t0
log(f"beam build steady: {(PN - PN // 2) / dt:.0f} inserts/s")

# ---- ablate one synthetic wave at full corpus
cfg = idx._cfg
state = idx._state
W = 512
wid = jnp.arange(PN, PN + W, dtype=jnp.int32) % state.capacity  # fake slots
wvec = jnp.asarray(vecs[:W])
wlvl = jnp.zeros(W, jnp.int32)
valid = jnp.ones(W, bool)


def timeit(name, fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    log(f"{name}: {dt * 1e3:.1f} ms")
    return out


# candidate-generation beam at construction shapes
qn = jnp.sum(wvec * wvec, axis=1)
ep = jnp.broadcast_to(state.ep, (W,))
efc = cfg.ef_construction
p = cfg.build_expand
mi = (cfg.search_iter_factor * efc) // p + 16
timeit(f"beam efC={efc} expand={p} W={W}", lambda: beam_search(
    cfg, state, wvec, qn, ep, ep >= 0, 0, efc, mi, expand=p))

# full wave phases (donation: pass through and keep the result)
st = state
st2 = timeit("scatter_wave", lambda: scatter_wave(
    cfg, st, wid, wvec, wlvl, valid), reps=1)
uid = jnp.full(8, -1, jnp.int32).at[0].set(wid[0])
ulv = jnp.zeros(8, jnp.int32)
uva = jnp.zeros(8, bool).at[0].set(True)
st3, ue = timeit("upper_connect (8 lanes)", lambda: upper_connect(
    cfg, st2, uid, ulv, uva), reps=1)
lanes = jnp.full(8, -1, jnp.int32)
st4 = timeit("base_connect", lambda: base_connect(
    cfg, st3, wid, wlvl, valid, lanes, ue), reps=1)
log("done")
