"""Host/device wave-scheduler agreement.

The host mirrors construct.wave_head's width formula exactly so that zero
per-wave host->device uploads are needed (index._insert_batch).  Two
clamps must stay in lockstep on both sides:

* the static bucket-ladder top (WAVE_BUCKETS[-1]): an unclamped host
  width silently dropped the tail of every wave wider than the ladder
  (advisor r2, medium);
* the upper-lane ladder top (UPPER_BUCKETS[-1]): a wave carrying more
  level>=1 members than the static upper bucket would silently strip
  their upper-layer edges (advisor r2, low).
"""

import numpy as np
import jax.numpy as jnp

import hnswindex_tpu.index as IX
from hnswindex_tpu import HNSWIndex, HNSWParameters
from hnswindex_tpu.core.construct import wave_head


def test_wave_head_upper_prefix_clamp():
    """Device-side: a wave stops before admitting more than max_up
    level>=1 members, keeping lanes a contiguous batch prefix."""
    n = 64
    dids = jnp.arange(n, dtype=jnp.int32)
    dvecs = jnp.zeros((n, 4), jnp.float32)
    lv = np.zeros(n, np.int32)
    lv[10:40] = 1                      # 30 upper members in lanes 10..39
    dlvls = jnp.asarray(lv)
    wid, wvec, wlvl, valid, cur = wave_head(
        jnp.asarray(1000, jnp.int32), dids, dvecs, dlvls,
        jnp.asarray(0, jnp.int32), jnp.asarray(n, jnp.int32),
        bucket=64, max_wave=64, max_up=8)
    v = np.asarray(valid)
    # lanes 0..17 pass (lanes 10..17 carry the 8 allowed uppers)
    assert v[:18].all() and not v[18:].any()
    assert int(np.asarray(cur)) == 18
    # host mirror formula gives the same width
    w = min(64, 64, max(1, 1000), n)
    upc = np.cumsum(lv[:w] >= 1)
    w = int(np.searchsorted(upc, 8, side="right"))
    assert w == 18


def test_wave_head_no_clamp_when_bucket_small():
    """max_up >= bucket skips the cumsum path entirely."""
    n = 16
    dids = jnp.arange(n, dtype=jnp.int32)
    dvecs = jnp.zeros((n, 4), jnp.float32)
    dlvls = jnp.ones((n,), jnp.int32)
    _, _, _, valid, cur = wave_head(
        jnp.asarray(1000, jnp.int32), dids, dvecs, dlvls,
        jnp.asarray(0, jnp.int32), jnp.asarray(n, jnp.int32),
        bucket=16, max_wave=16, max_up=512)
    assert np.asarray(valid).all()
    assert int(np.asarray(cur)) == n


def test_build_with_max_wave_past_bucket_ladder(monkeypatch):
    """max_wave_size far beyond WAVE_BUCKETS[-1] must not desync the host
    count mirror from the device (the tail of each wave used to be
    silently dropped)."""
    monkeypatch.setattr(IX, "WAVE_BUCKETS", (8, 64))
    rng = np.random.default_rng(7)
    n, dim = 300, 16
    vecs = rng.random((n, dim), dtype=np.float32)
    idx = HNSWIndex(dim, parameters=HNSWParameters(
        collection_size=512, max_wave_size=100000))
    ids = idx.add(vecs)
    assert idx.count == n
    assert int(np.asarray(idx._state.count)) == n
    act = np.asarray(idx._state.active)
    assert act[ids].all()
    r, _ = idx.knn_query(vecs, k=1)
    assert float(np.mean(r[:, 0] == ids)) > 0.85


def test_reverse_compaction_equivalence(monkeypatch):
    """The compacted overflow re-prune (budget path AND its cond
    fallback) must produce graphs identical to the full-width prune."""
    from hnswindex_tpu.core import construct as CT

    rng = np.random.default_rng(99)
    n, dim = 400, 16
    vecs = rng.random((n, dim), dtype=np.float32)

    def build(num):
        monkeypatch.setattr(CT, "REVERSE_COMPACT_NUM", num)
        idx = HNSWIndex(dim, parameters=HNSWParameters(
            collection_size=512, max_wave_size=64))
        idx.add(vecs)
        return (np.asarray(idx._state.nbr0), np.asarray(idx._state.deg0),
                np.asarray(idx._state.nbru), np.asarray(idx._state.degu))

    full = build(0)        # compaction disabled
    half = build(4)        # budget P/2 (production default)
    tiny = build(1)        # budget P/8 — forces the cond fallback often
    for a, b in zip(full, half):
        assert np.array_equal(a, b)
    for a, b in zip(full, tiny):
        assert np.array_equal(a, b)


def test_wave_grouping_equivalence(monkeypatch):
    """K waves chained in one launch (insert_wave_fused k_waves) must
    produce graphs bit-identical to K separate launches: every wave
    quantity is device-derived, so the composed program is literally the
    same computation."""
    rng = np.random.default_rng(123)
    n, dim = 400, 16
    vecs = rng.random((n, dim), dtype=np.float32)

    def build(group):
        monkeypatch.setattr(IX, "WAVE_GROUP", group)
        idx = HNSWIndex(dim, parameters=HNSWParameters(
            collection_size=512, max_wave_size=8))
        idx.add(vecs)
        assert idx.count == n
        assert int(np.asarray(idx._state.count)) == n
        return (np.asarray(idx._state.nbr0), np.asarray(idx._state.deg0),
                np.asarray(idx._state.nbru), np.asarray(idx._state.degu))

    single = build(1)
    grouped = build(4)
    for a, b in zip(single, grouped):
        assert np.array_equal(a, b)


def test_upper_depth_bound_equivalence(monkeypatch):
    """Bounding upper_connect_exact's layer loop to the wave's bucketed
    top level (max_lvl / index._lvl_bucket) must be a pure no-op: layers
    above every member's level connect nothing, so the bounded build is
    bit-identical to the full-depth build."""
    rng = np.random.default_rng(7)
    n, dim = 500, 16
    vecs = rng.random((n, dim), dtype=np.float32)

    def build():
        idx = HNSWIndex(dim, parameters=HNSWParameters(
            collection_size=512, max_wave_size=64))
        idx.add(vecs)
        assert idx.count == n
        return (np.asarray(idx._state.nbr0), np.asarray(idx._state.deg0),
                np.asarray(idx._state.nbru), np.asarray(idx._state.degu))

    bounded = build()                       # default bucketed depth
    monkeypatch.setattr(IX, "_lvl_bucket", lambda ml: 0)
    full = build()                          # all L-1 layers every wave
    for a, b in zip(bounded, full):
        assert np.array_equal(a, b)


def test_build_with_upper_overflow_waves(monkeypatch):
    """A level distribution dense enough to overflow the upper-lane
    ladder splits waves instead of stripping upper edges."""
    monkeypatch.setattr(IX, "UPPER_BUCKETS", (4,))
    rng = np.random.default_rng(13)
    n, dim = 200, 16
    vecs = rng.random((n, dim), dtype=np.float32)
    idx = HNSWIndex(dim, parameters=HNSWParameters(
        collection_size=256, max_wave_size=64,
        distribution_rate=1.0))          # ~37% of inserts at level >= 1
    ids = idx.add(vecs)
    assert idx.count == n
    assert int(np.asarray(idx._state.count)) == n
    lvl = np.asarray(idx._state.level)
    act = np.asarray(idx._state.active)
    degu = np.asarray(idx._state.degu)
    up = np.flatnonzero(act & (lvl >= 1))
    # every upper node except the earliest few (which legitimately had no
    # peers at their layer yet) must hold layer-1 edges
    late = up[up >= 20]
    assert (degu[0][late] >= 1).all(), \
        f"{(degu[0][late] < 1).sum()} upper nodes lost their layer-1 edges"
    r, _ = idx.knn_query(vecs, k=1)
    assert float(np.mean(r[:, 0] == ids)) > 0.85
