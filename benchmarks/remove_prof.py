"""Per-phase profile of one removal wave (run on the live backend).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/remove_prof.py [N] [WAVE]
"""

import sys
import time

import numpy as np
import jax.numpy as jnp

from hnswindex_tpu import HNSWIndex, HNSWParameters
from hnswindex_tpu.core import remove as R


def sync(x):
    np.asarray(jnp.sum(x))  # force a tiny readback through the relay


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    wave = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    dim = 128
    rng = np.random.default_rng(0)
    vecs = rng.random((n, dim), dtype=np.float32)

    idx = HNSWIndex(dim, parameters=HNSWParameters(collection_size=n))
    t0 = time.perf_counter()
    ids = idx.add(vecs)
    print(f"build {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    cfg, state = idx._cfg, idx._state
    drop = rng.choice(ids, size=wave, replace=False).astype(np.int32)
    rem_j = jnp.asarray(drop)
    lvl = np.asarray(state.level)

    def tphase(name, fn):
        t = time.perf_counter()
        out = fn()
        if out is not None and hasattr(out, "dtype"):
            sync(out)
        elif isinstance(out, tuple):
            sync(out[0])
        else:
            sync(out.deg0)
        dt = time.perf_counter() - t
        print(f"{name}: {dt * 1000:.1f} ms", file=sys.stderr)
        return out

    # warm up compiles first: one full removal pass exercises every
    # (bucket, tier, layer-class, chunk) kernel combination
    state1 = R.remove_from_state(cfg, state, drop, 100)
    sync(state1.deg0)
    print("-- compiled; timing steady-state --", file=sys.stderr)

    # fresh removal wave, timed
    drop2 = rng.choice(np.setdiff1d(ids, drop), size=wave,
                       replace=False).astype(np.int32)
    rem_j = jnp.asarray(drop2)
    state = state1

    t_all = time.perf_counter()
    state = tphase("mark_removed", lambda: R.mark_removed(cfg, state, rem_j))

    t = time.perf_counter()
    aff_j, multi_j = R.affected_masks_all(cfg, state, rem_j)
    Cap = state.capacity
    aff_all = np.unpackbits(np.asarray(aff_j), axis=-1)[:, :Cap].astype(bool)
    multi_all = np.unpackbits(np.asarray(multi_j), axis=-1)[:, :Cap] \
        .astype(bool)
    print(f"affected_masks_all+readback: "
          f"{(time.perf_counter() - t) * 1000:.1f} ms", file=sys.stderr)

    top = int(lvl[drop2].max())
    for l in range(top, -1, -1):
        layer = jnp.asarray(l, jnp.int32)
        t = time.perf_counter()
        scand = R.exact_repair_candidates(cfg, state, rem_j, layer, 100)
        sync(scand)
        dt_c = time.perf_counter() - t
        fast = np.flatnonzero(aff_all[l] & ~multi_all[l])
        slow = np.flatnonzero(multi_all[l])
        max_deg = cfg.max_degree(l == 0)
        t = time.perf_counter()
        nbr_l, deg_l = R._slice_layer(state, l)
        nbr_l, deg_l = R._repair_rows(cfg, state.vlo, state.norms, nbr_l,
                                      deg_l, fast, rem_j, rem_j, scand,
                                      max_deg, 1, R.REPAIR_SPAN_1)
        sync(deg_l)
        dt_f = time.perf_counter() - t
        t = time.perf_counter()
        nbr_l, deg_l = R._repair_rows(cfg, state.vlo, state.norms, nbr_l,
                                      deg_l, slow, rem_j, rem_j, scand,
                                      max_deg, R.REPAIR_FANIN,
                                      R.REPAIR_SPAN)
        nbr_l, deg_l = R._clear_rows_slice(nbr_l, deg_l, rem_j)
        state = R._writeback_layer(state, nbr_l, deg_l, l)
        sync(state.deg0)
        dt_s = time.perf_counter() - t
        print(f"layer {l}: cands {dt_c * 1000:.0f} ms; "
              f"fast {fast.size} rows {dt_f * 1000:.0f} ms, "
              f"slow {slow.size} rows + clear + writeback "
              f"{dt_s * 1000:.0f} ms", file=sys.stderr)

    total = time.perf_counter() - t_all
    print(f"TOTAL wave of {wave}: {total * 1000:.0f} ms "
          f"-> {wave / total:.0f} removals/s", file=sys.stderr)


if __name__ == "__main__":
    main()
