"""Fused-era per-phase attribution of the steady-state build wave.

The production wave is ONE device program (construct.insert_wave_fused),
so the round-2 build_phase_probe (which wraps the unfused program names
on hnswindex_tpu.index) no longer sees the hot path.  This probe builds
a mature graph THROUGH THE DEVICE-RESIDENT PATH (device_build_probe's
scheme — host-upload seeding took 580 s through the relay), then times
the fused wave against its constituent programs dispatched separately
with forced syncs:

  - fused wave (production program, the number to attribute)
  - wave_head + scatter_wave            (lane compute + row writes)
  - upper_compact + upper_connect_exact (the ~W/M upper members)
  - exact_knn/exact_knn2 scan alone     (the MXU candidate scan)
  - base_connect_exact                  (scan + prune + reverse chain)

prune+reverse chain cost ~= base_connect_exact - scan.  Phases are timed
on the SAME wave repeatedly (state is cloned per rep, clone overhead
reported), and the relay adds ~30-40 ms of sync latency to every number
— reported as a floor and NOT subtracted (read deltas, not absolutes).

Usage: PYTHONPATH=/root/repo:/root/.axon_site \
           python benchmarks/wave_phase_probe.py [N]
Env: PW wave width (512), PSLACK reverse slack, PREPS reps (6).
"""

import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from hnswindex_tpu import HNSWIndex, HNSWParameters

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 20
DIM = 128
W = int(os.environ.get("PW", "512"))
REPS = int(os.environ.get("PREPS", "6"))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def sync(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])


def timed(name, fn, *a):
    out = fn(*a)                # warm/compile
    sync(out)
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*a)
        sync(out)
    dt = (time.perf_counter() - t0) / REPS * 1000
    log(f"  {name:36s} {dt:7.1f} ms")
    return out, dt


def main():
    # clustered data generated ON DEVICE (device_build_probe's scheme)
    n_centers = max(2, N // 500)
    key = jax.random.PRNGKey(31337)
    kc, kn, ka = jax.random.split(key, 3)
    centers = jax.random.uniform(kc, (n_centers, DIM), jnp.float32)
    assign = jax.random.randint(ka, (N,), 0, n_centers)
    dall = (centers[assign]
            + 0.03 * jax.random.normal(kn, (N, DIM), jnp.float32))
    dall.block_until_ready()

    params = HNSWParameters(collection_size=N, max_wave_size=W)
    if "PSLACK" in os.environ:
        params.reverse_slack = int(os.environ["PSLACK"])
    idx = HNSWIndex(DIM, parameters=params)
    idx.add(np.asarray(dall[:1024]))            # bootstrap wants numpy

    from hnswindex_tpu.core import construct as CT
    from hnswindex_tpu.core import graph as G
    from hnswindex_tpu.index import (SCAN_FLOOR, UPPER_BUCKETS,
                                     WAVE_BUCKETS, _bucket, _lvl_bucket,
                                     _next_pow2)

    cfg = idx._cfg

    # ---- seed to N - 8W rows via the upload-free device path ----------
    n_seed = N - 1024 - 8 * W
    ids = idx._alloc_slots(n_seed)
    lv = G.sample_levels(idx._rng, n_seed, idx.params.distribution_rate,
                         cfg.max_levels)
    idx._panel_append(ids[lv >= 1])
    idx._scan_hwm = max(idx._scan_hwm, int(ids.max()) + 1)
    dids = jnp.asarray(ids)
    dlvls = jnp.asarray(lv)
    n_dev = jnp.asarray(n_seed, jnp.int32)
    dseed = dall[1024:1024 + n_seed]
    cur = jnp.zeros((), jnp.int32)
    i = 0
    t0 = time.perf_counter()
    while i < n_seed:
        w = min(W, WAVE_BUCKETS[-1], max(1, idx._count_host), n_seed - i)
        upc = np.cumsum(lv[i:i + w] >= 1)
        if w > UPPER_BUCKETS[-1] and upc[-1] > UPPER_BUCKETS[-1]:
            w = int(np.searchsorted(upc, UPPER_BUCKETS[-1], side="right"))
        b = _bucket(w, WAVE_BUCKETS)
        up_cnt = int(upc[w - 1]) if w else 0
        ml = int(lv[i:i + w].max()) if up_cnt else 0
        cur = idx._insert_wave_dev(dids, dseed, dlvls, cur, n_dev, b,
                                   up_cnt, max_lvl=ml)
        idx._count_host += w
        i += w
    sync(idx._state.deg0)
    log(f"seeded {idx._count_host} rows in {time.perf_counter() - t0:.1f}s"
        f" (device path); scan_hwm={idx._scan_hwm}")

    # ---- the probe wave: next 512 ids, production quantities ----------
    rest = np.asarray(dall[N - 8 * W:])
    pids = idx._alloc_slots(rest.shape[0])
    plv = G.sample_levels(idx._rng, rest.shape[0],
                          idx.params.distribution_rate, cfg.max_levels)
    idx._panel_append(pids[plv >= 1])
    idx._scan_hwm = max(idx._scan_hwm, int(pids.max()) + 1)
    dids = jnp.asarray(pids)
    dlvls = jnp.asarray(plv)
    dvecs = jnp.asarray(rest)
    n_dev = jnp.asarray(rest.shape[0], jnp.int32)
    cur0 = jnp.zeros((), jnp.int32)

    nscan = min(idx._state.capacity,
                max(SCAN_FLOOR, _next_pow2(idx._scan_hwm)))
    bucket = _bucket(W, WAVE_BUCKETS)
    up_cnt = int((plv[:W] >= 1).sum())
    ubucket = _bucket(max(1, up_cnt), UPPER_BUCKETS)
    max_lvl = int(plv[:W].max())
    mu = UPPER_BUCKETS[-1]
    lvb = _lvl_bucket(max_lvl) if up_cnt else 0
    log(f"wave: W={W} bucket={bucket} nscan={nscan} up_cnt={up_cnt} "
        f"ubucket={ubucket} max_lvl={max_lvl} lvl_bucket={lvb}")

    zero = jnp.zeros((), jnp.int32)
    _, lat = timed("(relay sync floor)", lambda z: z + 1, zero)

    state = idx._state
    panel = idx._upper_ids

    def clone(st):
        return jax.tree_util.tree_map(
            lambda x: x + 0 if hasattr(x, "dtype") else x, st)

    _, t_clone = timed("(state clone overhead)",
                       lambda st: clone(st).deg0, state)

    # 1. production fused wave (exactly _insert_wave_dev's call)
    def fused(st):
        st2, _ = CT.insert_wave_fused(cfg, clone(st), dids, dvecs, dlvls,
                                      cur0, n_dev, panel, bucket, ubucket,
                                      W, nscan, mu, 1, lvb)
        return st2.deg0
    _, t_fused = timed("fused wave (production)", fused, state)

    # 2. wave_head + scatter_wave
    wid, wvec, wlvl, valid, _ = CT.wave_head(
        state.count, dids, dvecs, dlvls, cur0, n_dev, bucket, W, mu)
    sync(wid)

    def head_scatter(st):
        w_, v_, l_, ok_, _c = CT.wave_head(st.count, dids, dvecs, dlvls,
                                           cur0, n_dev, bucket, W, mu)
        return CT.scatter_wave(cfg, clone(st), w_, v_, l_, ok_).deg0
    _, t_hs = timed("wave_head + scatter_wave", head_scatter, state)

    st_sc = CT.scatter_wave(cfg, clone(state), wid, wvec, wlvl, valid)
    sync(st_sc.deg0)

    # 3. upper phase
    def upper(st):
        uid, ulvl, uval, _l = CT.upper_compact(wid, wlvl, valid, ubucket)
        return CT.upper_connect_exact(cfg, clone(st), uid, ulvl, uval,
                                      panel, lvb).deg0
    _, t_up = timed("upper_compact + upper_connect", upper, st_sc)

    # 4. candidate scan alone (the MXU part of base_connect_exact)
    from hnswindex_tpu.ops.bruteforce import exact_knn, exact_knn2
    qv = st_sc.vectors[jnp.clip(wid, 0, st_sc.capacity - 1)]
    sync(qv)

    if st_sc.coarse_table is not None and st_sc.capacity >= (1 << 21):
        def scan(st):
            return exact_knn2(cfg.metric, st.vectors,
                              st.coarse_table[:nscan], st.norms[:nscan],
                              st.active[:nscan], qv, cfg.ef_construction,
                              exclude=wid)[1]
    else:
        def scan(st):
            return exact_knn(cfg.metric, st.vlo[:nscan], st.norms[:nscan],
                             st.active[:nscan], qv, cfg.ef_construction,
                             exclude=wid)[1]
    _, t_scan = timed("exact candidate scan alone", scan, st_sc)

    # 4b. the two-stage fused alternative on the SAME wave (the
    # BUILD_SCAN2_MIN lever): coarse = the bf16 vlo mirror
    ct2 = st_sc.coarse_table
    if ct2 is not None:
        def scan2(st):
            return exact_knn2(cfg.metric, st.vectors,
                              st.coarse_table[:nscan], st.norms[:nscan],
                              st.active[:nscan], qv, cfg.ef_construction,
                              exclude=wid)[1]
        t0c = time.perf_counter()
        _, t_scan2 = timed("exact_knn2 fused scan alone", scan2, st_sc)
        log(f"    (scan2 compile+first call took "
            f"{time.perf_counter() - t0c - REPS * t_scan2 / 1000:.1f}s)")

    # 5. base_connect_exact (scan + prune + fwd scatter + reverse chain)
    def base(st):
        return CT.base_connect_exact(cfg, clone(st), wid, wlvl, valid,
                                     nscan=nscan).deg0
    _, t_base = timed("base_connect_exact (scan+prune+rev)", base, st_sc)

    log("---- attribution ----")
    log(f"  sync floor {lat:.1f} ms rides every number; clone adds "
        f"{t_clone - lat:.1f} ms")
    log(f"  prune+reverse chain (base - scan):    "
        f"{t_base - t_scan:7.1f} ms")
    log(f"  unfused sum (head+up+base - 2*clone): "
        f"{t_hs + t_up + t_base - 2 * t_clone:7.1f} ms "
        f"vs fused {t_fused - t_clone + lat:.1f} ms")
    log(f"  implied steady rate at W={W}: "
        f"{W / max(1e-9, (t_fused - t_clone + lat) / 1000):.0f} "
        f"inserts/s (clone-corrected)")


if __name__ == "__main__":
    main()
