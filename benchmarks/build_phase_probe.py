"""Phase-accurate build-wave profile in the 8.4M-row regime.

Seeds a small graph inside an 8M-capacity index, jumps the exact-scan
high-water mark to full capacity (the only corpus-size-dependent wave
cost), then times the three per-wave device programs exactly as
production dispatched them pre-fusion (the modern fused-wave attribution lives in wave_phase_probe.py), with a
forced sync after each.

Usage: PYTHONPATH=/root/repo:/root/.axon_site \
           python benchmarks/build_phase_probe.py
"""

import collections
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from hnswindex_tpu import HNSWIndex, HNSWParameters
from hnswindex_tpu import index as IDX

CAP = int(os.environ.get("PCAP", str(8 << 20)))
SEED_N = int(os.environ.get("PSEED", str(256 * 1024)))
DIM = 128
W = int(os.environ.get("PW", "512"))
WAVES = int(os.environ.get("PWAVES", "24"))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _sync(o):
    leaf = jax.tree_util.tree_leaves(o)[0]
    np.asarray(leaf.ravel()[:1])


TIMES = collections.defaultdict(float)
COUNTS = collections.defaultdict(int)
ENABLED = False


def wrap(name):
    orig = getattr(IDX, name)

    def timed(*a, **kw):
        if not ENABLED:
            return orig(*a, **kw)
        t0 = time.perf_counter()
        out = orig(*a, **kw)
        _sync(out)
        TIMES[name] += time.perf_counter() - t0
        COUNTS[name] += 1
        return out

    setattr(IDX, name, timed)


def main():
    global ENABLED
    rng = np.random.default_rng(31337)
    centers = rng.random((2048, DIM)).astype(np.float32)

    def make(n):
        return (centers[rng.integers(0, centers.shape[0], n)]
                + 0.03 * rng.standard_normal((n, DIM)).astype(np.float32))

    idx = HNSWIndex(DIM, parameters=HNSWParameters(
        collection_size=CAP, max_wave_size=W))
    t0 = time.perf_counter()
    idx.add(make(SEED_N))
    _sync(idx._state.deg0)
    log(f"seed {SEED_N} in {time.perf_counter() - t0:.1f}s")

    idx._scan_hwm = CAP           # mature-scan regime

    for name in ("scatter_wave", "upper_connect_exact",
                 "base_connect_exact"):
        wrap(name)

    # warm the full-capacity scan compile
    t0 = time.perf_counter()
    idx.add(make(2 * W))
    _sync(idx._state.deg0)
    log(f"warm waves (incl. compile): {time.perf_counter() - t0:.1f}s")

    ENABLED = True
    chunk = make(WAVES * W)
    t0 = time.perf_counter()
    idx.add(chunk)
    _sync(idx._state.deg0)
    total = time.perf_counter() - t0
    log(f"{WAVES} timed waves of {W}: {total:.2f}s "
        f"-> {WAVES * W / total:.0f} inserts/s "
        f"({total / WAVES * 1000:.0f} ms/wave)")
    acc = 0.0
    for name in sorted(TIMES, key=TIMES.get, reverse=True):
        log(f"  {name}: {TIMES[name] / COUNTS[name] * 1000:.1f} ms/call "
            f"over {COUNTS[name]} calls")
        acc += TIMES[name]
    log(f"  (untimed host remainder: {(total - acc) / WAVES * 1000:.0f} "
        f"ms/wave)")


if __name__ == "__main__":
    main()
