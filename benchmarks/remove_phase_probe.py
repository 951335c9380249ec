"""Phase-accurate removal profile: wraps the engine's own dispatch points
so the timed wave runs EXACTLY the production flow (remove_from_state),
with a forced sync after each phase.  Warmup uses the same wave bucket so
the timed pass hits only warm kernels.

Usage: PYTHONPATH=/root/repo:/root/.axon_site \
           python benchmarks/remove_phase_probe.py [N] [WAVE] [DATA]
"""

import collections
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from hnswindex_tpu import HNSWIndex, HNSWParameters
from hnswindex_tpu.core import remove as R


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _sync(o):
    leaf = jax.tree_util.tree_leaves(o)[0]
    np.asarray(leaf.ravel()[:1])


TIMES = collections.defaultdict(float)
COUNTS = collections.defaultdict(int)
ENABLED = False


def wrap(mod, name):
    orig = getattr(mod, name)

    def timed(*a, **kw):
        if not ENABLED:
            return orig(*a, **kw)
        t0 = time.perf_counter()
        out = orig(*a, **kw)
        _sync(out)
        TIMES[name] += time.perf_counter() - t0
        COUNTS[name] += 1
        return out

    setattr(mod, name, timed)


def main():
    global ENABLED
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    wave = int(sys.argv[2]) if len(sys.argv) > 2 else 32768
    kind = sys.argv[3] if len(sys.argv) > 3 else "uniform"
    dim = 128
    rng = np.random.default_rng(0)
    if kind == "clustered":
        centers = rng.random((max(2, n // 500), dim)).astype(np.float32)
        vecs = (centers[rng.integers(0, centers.shape[0], n)]
                + 0.03 * rng.standard_normal((n, dim)).astype(np.float32))
    else:
        vecs = rng.random((n, dim), dtype=np.float32)

    idx = HNSWIndex(dim, parameters=HNSWParameters(collection_size=n))
    t0 = time.perf_counter()
    ids = idx.add(vecs)
    log(f"build {time.perf_counter() - t0:.1f}s")

    for name in ("mark_removed", "affected_masks_all",
                 "exact_repair_candidates", "repair_chunk",
                 "_slice_layer", "_writeback_layer", "_clear_rows_slice"):
        wrap(R, name)

    drop = rng.choice(ids, size=2 * wave, replace=False).astype(np.int32)

    t0 = time.perf_counter()
    idx.remove(drop[:wave])
    log(f"warm wave of {wave}: {time.perf_counter() - t0:.1f}s "
        f"(incl. compiles)")

    ENABLED = True
    t0 = time.perf_counter()
    idx.remove(drop[wave:])
    total = time.perf_counter() - t0
    log(f"timed wave of {wave}: {total:.2f}s -> {wave / total:.0f}/s")
    acc = 0.0
    for name in sorted(TIMES, key=TIMES.get, reverse=True):
        log(f"  {name}: {TIMES[name] * 1000:.0f} ms over {COUNTS[name]} "
            f"calls")
        acc += TIMES[name]
    log(f"  (untimed host/readback remainder: {(total - acc) * 1000:.0f} "
        f"ms)")


if __name__ == "__main__":
    main()
