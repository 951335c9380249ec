"""Device-side build rate: construction throughput with the wave vectors
already resident on device, bypassing the host->device tunnel.

Through the tunneled backend, `add()`'s wave uploads move at the relay's
H2D rate (measured 2.9-18 MB/s depending on the day), which caps the
apparent insert rate at ~6-40k/s REGARDLESS of device speed: a 1M x
128-d f32 build ships 512 MB.  On production hardware (chip-local host,
PCIe) ingestion is >10 GB/s and irrelevant.  This probe feeds
`_insert_wave_dev` from device-resident slices so the number reflects the
engine, not the tunnel.

Usage: PYTHONPATH=/root/repo:/root/.axon_site \
           python benchmarks/device_build_probe.py [N]
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


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    rng = np.random.default_rng(31337)
    # clustered data generated ON DEVICE (same distribution as bench.py)
    n_centers = max(2, N // 500)
    key = jax.random.PRNGKey(31337)
    kc, kn, ka = jax.random.split(key, 3)
    centers = jax.random.uniform(kc, (n_centers, DIM), jnp.float32)
    assign = jax.random.randint(ka, (N,), 0, n_centers)
    dvecs = (centers[assign]
             + 0.03 * jax.random.normal(kn, (N, DIM), jnp.float32))
    dvecs.block_until_ready()

    params = HNSWParameters(collection_size=N, max_wave_size=W)
    if "PSLACK" in os.environ:                 # reverse-slack A/B knob
        params.reverse_slack = int(os.environ["PSLACK"])
    idx = HNSWIndex(DIM, parameters=params)
    # seed the graph with a small host batch (the bootstrap path wants
    # numpy); the rest streams from device memory
    seed_n = 1024
    idx.add(np.asarray(dvecs[:seed_n]))

    from hnswindex_tpu.core import graph as G
    from hnswindex_tpu.index import UPPER_BUCKETS, WAVE_BUCKETS, \
        SCAN_FLOOR, _bucket, _next_pow2

    # drive the production upload-free wave path (_insert_wave_dev) with
    # the batch already device-resident: ids/levels upload once (8 MB),
    # vectors never cross the link
    n_rest = N - seed_n
    ids = idx._alloc_slots(n_rest)
    lv = G.sample_levels(idx._rng, n_rest, idx.params.distribution_rate,
                         idx._cfg.max_levels)
    idx._panel_append(ids[lv >= 1])
    idx._scan_hwm = max(idx._scan_hwm, int(ids.max()) + 1)
    dids = jnp.asarray(ids)
    dlvls = jnp.asarray(lv)
    n_dev = jnp.asarray(n_rest, jnp.int32)
    cur = jnp.zeros((), jnp.int32)
    dbatch = dvecs[seed_n:]

    from hnswindex_tpu.index import WAVE_GROUP

    i = 0
    t_half = None
    t0 = time.perf_counter()
    mw_full = min(W, WAVE_BUCKETS[-1])
    while i < n_rest:
        # mirror index._insert_batch's scheduler exactly (incl. the
        # steady-state wave grouping and the bucket/upper-ladder clamps)
        grp = WAVE_GROUP
        if (grp > 1 and idx._count_host >= mw_full
                and n_rest - i >= grp * mw_full
                and idx._count_host + grp * mw_full
                <= idx.params.exact_build_threshold):
            lv_g = lv[i:i + grp * mw_full]
            per_up = (lv_g >= 1).reshape(grp, mw_full).sum(axis=1)
            if (mw_full <= UPPER_BUCKETS[-1]
                    or per_up.max() <= UPPER_BUCKETS[-1]):
                b = _bucket(mw_full, WAVE_BUCKETS)
                cur = idx._insert_wave_dev(dids, dbatch, dlvls, cur,
                                           n_dev, b, int(per_up.max()),
                                           k_waves=grp,
                                           max_lvl=int(lv_g.max()))
                idx._count_host += grp * mw_full
                i += grp * mw_full
                if t_half is None and i >= n_rest // 2:
                    np.asarray(idx._state.deg0[:1])
                    t_half = time.perf_counter()
                    n_half = i
                continue
        w = min(W, WAVE_BUCKETS[-1], max(1, idx._count_host), n_rest - i)
        upc = np.cumsum(lv[i:i + w] >= 1)
        if w > UPPER_BUCKETS[-1] and upc[-1] > UPPER_BUCKETS[-1]:
            w = int(np.searchsorted(upc, UPPER_BUCKETS[-1], side="right"))
        b = _bucket(w, WAVE_BUCKETS)
        up_cnt = int(upc[w - 1]) if w else 0
        ml = int(lv[i:i + w].max()) if up_cnt else 0
        cur = idx._insert_wave_dev(dids, dbatch, dlvls, cur, n_dev, b,
                                   up_cnt, max_lvl=ml)
        idx._count_host += w
        i += w
        if t_half is None and i >= n_rest // 2:
            np.asarray(idx._state.deg0[:1])
            t_half = time.perf_counter()
            n_half = i
    np.asarray(idx._state.deg0[:1])
    t1 = time.perf_counter()
    log(f"device-side build: {i} rows in {t1 - t0:.1f}s "
        f"({i / (t1 - t0):.0f}/s incl. compiles)")
    log(f"steady (second half): {(i - n_half) / (t1 - t_half):.0f} "
        f"inserts/s")

    # sanity: recall of the built graph
    sub = rng.integers(0, N, 1024)
    q = np.asarray(dvecs[sub])
    qi, _ = idx.knn_query(q, k=1)
    log(f"self-recall@1: {(qi[:, 0] == sub).mean():.3f}")


if __name__ == "__main__":
    main()
