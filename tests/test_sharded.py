"""Multi-chip sharded index on a virtual 8-device CPU mesh
(SURVEY.md §4: device-mesh simulation via host-platform device count)."""

import numpy as np
import pytest

import jax

from hnswindex_tpu.params import HNSWParameters
from hnswindex_tpu.parallel.sharded import ShardedIndex

DIM = 32
N = 600


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs multiple devices")
def test_sharded_build_and_query():
    devices = jax.devices()[:4]
    rng = np.random.default_rng(65537)
    vecs = rng.random((N, DIM), dtype=np.float32)

    p = HNSWParameters(collection_size=N, max_wave_size=256)
    idx = ShardedIndex(DIM, parameters=p, devices=devices)
    gids = idx.add(vecs)
    assert idx.count == N
    assert len(set(gids.tolist())) == N

    ids, dists = idx.knn_query(vecs, k=1)
    recall = (ids[:, 0] == gids).mean()
    assert recall > 0.85, recall
    assert np.all(np.diff(np.nan_to_num(dists, nan=np.inf), axis=1) >= -1e-6)


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs multiple devices")
def test_sharded_capacity_growth():
    """Mesh analog of the reference's resize behavior
    (GraphResizeTests.cs:17-38): start tiny, insert far past the initial
    per-shard capacity through several doublings; every previously
    returned gid stays valid (interleaved gids are capacity-independent)
    and recall holds."""
    devices = jax.devices()[:4]
    S = len(devices)
    rng = np.random.default_rng(97)
    p = HNSWParameters(collection_size=10 * S, max_wave_size=64)
    idx = ShardedIndex(DIM, parameters=p, devices=devices)
    cap0 = idx.shard_capacity

    vecs = rng.random((N, DIM), dtype=np.float32)
    gids = []
    for i in range(0, N, 100):      # incremental adds straddle doublings
        gids.append(idx.add(vecs[i:i + 100]))
    gids = np.concatenate(gids)
    assert idx.shard_capacity > cap0          # actually grew
    assert idx.count == N
    assert len(set(gids.tolist())) == N       # ids unique across growth
    # round-robin interleaved gids are dense from 0, like the reference
    assert sorted(gids.tolist()) == list(range(N))

    ids, _ = idx.knn_query(vecs, k=1)
    recall = (ids[:, 0] == gids).mean()
    assert recall > 0.85, recall
    # early-wave gids (returned before any growth) still resolve to their
    # original vectors
    hv = idx._host_vecs()
    g0 = gids[:10]
    assert np.allclose(hv[g0 % S, g0 // S], vecs[:10])


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs multiple devices")
def test_sharded_growth_with_removals_and_snapshot(tmp_path):
    """Growth composes with slot recycling and serialize/deserialize (a
    grown snapshot restores onto the grown geometry)."""
    devices = jax.devices()[:4]
    S = len(devices)
    rng = np.random.default_rng(98)
    p = HNSWParameters(collection_size=8 * S, max_wave_size=64,
                       allow_removals=True)
    idx = ShardedIndex(DIM, parameters=p, devices=devices)
    vecs = rng.random((300, DIM), dtype=np.float32)
    gids = idx.add(vecs)
    assert idx.shard_capacity > 8
    idx.remove(gids[:50])
    fresh = rng.random((50, DIM), dtype=np.float32)
    gnew = idx.add(fresh)
    assert np.isin(gnew, gids[:50]).all()     # recycled before regrowth

    path = str(tmp_path / "grown.npz")
    idx.serialize(path)
    idx2 = ShardedIndex.deserialize(path)
    assert idx2.shard_capacity == idx.shard_capacity
    ids_a, d_a = idx.knn_query(vecs[50:82], k=3)
    ids_b, d_b = idx2.knn_query(vecs[50:82], k=3)
    assert np.array_equal(ids_a, ids_b)


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs multiple devices")
def test_sharded_exact_mode():
    devices = jax.devices()[:4]
    rng = np.random.default_rng(7)
    vecs = rng.random((300, DIM), dtype=np.float32)
    p = HNSWParameters(collection_size=320, max_wave_size=128)
    idx = ShardedIndex(DIM, parameters=p, devices=devices)
    gids = idx.add(vecs)
    q = rng.random((12, DIM), dtype=np.float32)
    ids, dists = idx.knn_query(q, k=5, exact=True)
    d_all = ((q[:, None, :] - vecs[None, :, :]) ** 2).sum(-1)
    bf = gids[np.argsort(d_all, axis=1)[:, :5]]
    assert np.array_equal(ids, bf)
    assert np.all(np.diff(dists, axis=1) >= -1e-6)


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs multiple devices")
def test_sharded_matches_brute_force_topk():
    devices = jax.devices()[:2]
    rng = np.random.default_rng(3)
    vecs = rng.random((200, DIM), dtype=np.float32)
    p = HNSWParameters(collection_size=256, max_candidates=200,
                       max_wave_size=64, min_nn=64)  # wide beam ef=64
    idx = ShardedIndex(DIM, parameters=p, devices=devices)
    gids = idx.add(vecs)

    q = rng.random((16, DIM), dtype=np.float32)
    ids, dists = idx.knn_query(q, k=5)

    # brute force in global-id space
    d_all = ((q[:, None, :] - vecs[None, :, :]) ** 2).sum(-1)
    bf = np.argsort(d_all, axis=1)[:, :5]
    bf_gids = gids[bf]
    # high ef relative to corpus -> essentially exact
    overlap = np.mean([
        len(set(ids[i].tolist()) & set(bf_gids[i].tolist())) / 5
        for i in range(16)])
    assert overlap > 0.9, overlap


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs multiple devices")
def test_sharded_serialize_roundtrip(tmp_path):
    devices = jax.devices()[:2]
    rng = np.random.default_rng(11)
    vecs = rng.random((200, DIM), dtype=np.float32)
    p = HNSWParameters(collection_size=256, max_wave_size=64)
    idx = ShardedIndex(DIM, parameters=p, devices=devices)
    gids = idx.add(vecs)
    path = str(tmp_path / "sharded.npz")
    idx.serialize(path)
    r = ShardedIndex.deserialize(path, devices=devices)
    assert r.count == idx.count
    a = idx.knn_query(vecs[:32], 5)
    b = r.knn_query(vecs[:32], 5)
    assert np.array_equal(a[0], b[0])
    # restored index accepts more inserts
    extra = rng.random((40, DIM), dtype=np.float32)
    nid = r.add(extra)
    assert r.count == 240


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs multiple devices")
def test_sharded_snapshot_gid_scheme_guard(tmp_path):
    """Snapshots carry a gid-scheme marker; pre-interleaved snapshots
    (no marker / wrong marker) are rejected instead of silently remapping
    every externally-held gid (ADVICE r4 medium)."""
    import json
    devices = jax.devices()[:2]
    rng = np.random.default_rng(29)
    p = HNSWParameters(collection_size=64, max_wave_size=32)
    idx = ShardedIndex(DIM, parameters=p, devices=devices)
    idx.add(rng.random((40, DIM), dtype=np.float32))
    path = str(tmp_path / "snap.npz")
    idx.serialize(path)
    with np.load(path) as z:
        header = json.loads(bytes(z["header"]).decode())
        arrays = {f: z[f] for f in z.files if f != "header"}
    assert header["gid_scheme"] == "interleaved"
    # forge a legacy (marker-less) snapshot
    del header["gid_scheme"]
    legacy = str(tmp_path / "legacy.npz")
    np.savez_compressed(
        legacy,
        header=np.frombuffer(json.dumps(header).encode(), np.uint8),
        **arrays)
    with pytest.raises(ValueError, match="gid"):
        ShardedIndex.deserialize(legacy, devices=devices)


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs multiple devices")
def test_sharded_bool_filter_mask_shape_guard():
    """A wrong-length bool filter mask raises instead of being
    reinterpreted as a {0,1} id list (ADVICE r4 low)."""
    devices = jax.devices()[:2]
    rng = np.random.default_rng(31)
    p = HNSWParameters(collection_size=64, max_wave_size=32)
    idx = ShardedIndex(DIM, parameters=p, devices=devices)
    gids = idx.add(rng.random((40, DIM), dtype=np.float32))
    q = rng.random((4, DIM), dtype=np.float32)
    with pytest.raises(ValueError, match="bool filter mask"):
        idx.knn_query(q, 3, filter_fnc=np.ones(7, dtype=bool))
    # a correctly-sized mask still works
    total = idx.n_shards * idx.shard_capacity
    mask = np.zeros(total, dtype=bool)
    mask[gids[:10]] = True
    ids, _ = idx.knn_query(q, 3, filter_fnc=mask)
    assert np.isin(ids[ids >= 0], gids[:10]).all()


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs multiple devices")
def test_sharded_remove():
    devices = jax.devices()[:2]
    rng = np.random.default_rng(17)
    vecs = rng.random((240, DIM), dtype=np.float32)
    p = HNSWParameters(collection_size=256, max_wave_size=64)
    idx = ShardedIndex(DIM, parameters=p, devices=devices)
    gids = idx.add(vecs)
    idx.remove(gids[:120])
    assert idx.count == 120
    ids, _ = idx.knn_query(vecs[120:], 1)
    assert (ids[:, 0] == gids[120:]).mean() > 0.85
    assert not np.isin(ids[ids >= 0], gids[:120]).any()


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs multiple devices")
def test_sharded_slot_recycling():
    """Freed slots are handed out again; a delete-heavy workload does not
    exhaust shard capacity (round-1 gap)."""
    devices = jax.devices()[:2]
    rng = np.random.default_rng(23)
    p = HNSWParameters(collection_size=128, max_wave_size=32)
    idx = ShardedIndex(DIM, parameters=p, devices=devices)
    vecs = rng.random((120, DIM), dtype=np.float32)
    gids = idx.add(vecs)
    # churn several times past the nominal capacity
    for round_ in range(4):
        idx.remove(gids[:60])
        fresh = rng.random((60, DIM), dtype=np.float32)
        new_gids = idx.add(fresh)
        assert idx.count == 120
        assert np.isin(new_gids, gids[:60]).all()   # recycled
        ri, _ = idx.knn_query(fresh, 1)
        assert (ri[:, 0] == new_gids).mean() > 0.85
        gids = np.concatenate([gids[60:], new_gids])
        vecs = np.concatenate([vecs[60:], fresh])


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs multiple devices")
def test_sharded_filters_and_layer():
    devices = jax.devices()[:4]
    rng = np.random.default_rng(29)
    vecs = rng.random((N, DIM), dtype=np.float32)
    p = HNSWParameters(collection_size=N, max_wave_size=128)
    idx = ShardedIndex(DIM, parameters=p, devices=devices)
    gids = idx.add(vecs)

    allowed = gids[: N // 3]
    fi, fd = idx.knn_query(vecs[:64], k=5, filter_fnc=allowed)
    got = fi[fi >= 0]
    assert got.size > 0 and np.isin(got, allowed).all()
    # callable predicate over the stored vector
    fi2, _ = idx.knn_query(vecs[:8], k=3, filter_fnc=lambda v: v[0] > 0.5)
    S = idx.n_shards
    hv = idx._host_vecs()
    sel = fi2[fi2 >= 0]
    assert (hv[sel % S, sel // S][:, 0] > 0.5).all()
    # layer argument restricts results to upper-layer members
    li, _ = idx.knn_query(vecs[:16], k=3, layer=1, exact=True)
    lvl = np.asarray(idx._state.level)
    sel = li[li >= 0]
    assert (lvl[sel % S, sel // S] >= 1).all()


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs multiple devices")
def test_sharded_range_query():
    devices = jax.devices()[:4]
    rng = np.random.default_rng(31)
    vecs = rng.random((400, DIM), dtype=np.float32)
    p = HNSWParameters(collection_size=512, max_wave_size=128)
    idx = ShardedIndex(DIM, parameters=p, devices=devices)
    gids = idx.add(vecs)
    d_all = ((vecs[:8, None, :] - vecs[None, :, :]) ** 2).sum(-1)
    # radius sized to make the truth set ~30 per query
    radius = float(np.median(np.sort(d_all, axis=1)[:, 30]))
    ids_out, d_out = idx.range_query(vecs[:8], radius)
    for r in range(8):
        assert np.all(np.diff(d_out[r]) >= -1e-6)
        assert np.all(d_out[r] <= radius + 1e-6)
        assert len(ids_out[r]) > 0
        # recall vs brute force within radius
        truth = set(gids[np.flatnonzero(d_all[r] <= radius)].tolist())
        got = set(ids_out[r].tolist())
        assert got <= truth
        assert len(got & truth) / max(1, len(truth)) > 0.7


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs multiple devices")
def test_sharded_multi_layer_and_info():
    devices = jax.devices()[:4]
    rng = np.random.default_rng(37)
    vecs = rng.random((N, DIM), dtype=np.float32)
    p = HNSWParameters(collection_size=N, max_wave_size=128)
    idx = ShardedIndex(DIM, parameters=p, devices=devices)
    gids = idx.add(vecs)

    res = idx.multi_layer_knn_query(vecs[0], k=5)
    assert len(res) >= 1 and res[0] is not None
    ids0, d0 = res[0]
    assert np.all(np.diff(d0) >= -1e-6)
    assert gids[0] not in ids0          # closest (self) is dropped

    info = idx.get_info()
    assert info.layers and info.layers[0].nodes_count == N
    for li in info.layers:
        assert abs(li.avg_out_edges - li.avg_in_edges) < 1e-6

    cc = idx.get_connected_component_counts()
    # disjoint subgraphs: one component per shard at layer 0
    assert cc[0] == len(devices)

    assert sorted(idx.ids().tolist()) == sorted(gids.tolist())
    assert idx.items().shape == (N, DIM)


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs multiple devices")
def test_sharded_update():
    devices = jax.devices()[:2]
    rng = np.random.default_rng(41)
    vecs = rng.random((200, DIM), dtype=np.float32)
    p = HNSWParameters(collection_size=256, max_wave_size=64)
    idx = ShardedIndex(DIM, parameters=p, devices=devices)
    gids = idx.add(vecs)
    new_vals = rng.random((30, DIM), dtype=np.float32)
    idx.update(gids[:30], new_vals)
    assert idx.count == 200
    ri, _ = idx.knn_query(new_vals, 1)
    assert (ri[:, 0] == gids[:30]).mean() > 0.85
    # stored vectors actually replaced
    S = idx.n_shards
    hv = idx._host_vecs()
    g0 = gids[0]
    assert np.allclose(hv[g0 % S, g0 // S], new_vals[0])
    with pytest.raises(ValueError):
        idx.update(gids[:2][[0, 0]], new_vals[:2])
    with pytest.raises(ValueError):
        idx.update(np.asarray([10 ** 9]), new_vals[:1])


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs multiple devices")
def test_sharded_remove_ignores_out_of_range_ids():
    """Negative / beyond-capacity gids are ignored like inactive ones —
    a negative id must not wrap onto a live node in the last shard."""
    devices = jax.devices()[:2]
    rng = np.random.default_rng(47)
    vecs = rng.random((100, DIM), dtype=np.float32)
    p = HNSWParameters(collection_size=128, max_wave_size=32)
    idx = ShardedIndex(DIM, parameters=p, devices=devices)
    gids = idx.add(vecs)
    cap = idx.n_shards * idx.shard_capacity
    idx.remove([-1, -cap, cap, cap + 7, 10 ** 12])
    assert idx.count == 100
    ids, _ = idx.knn_query(vecs, 1)
    assert (ids[:, 0] == gids).mean() > 0.85
    # mixed valid + invalid: only the valid live id is removed
    idx.remove([int(gids[0]), -1, cap])
    assert idx.count == 99


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs multiple devices")
def test_sharded_bulk_update_waves_throttled():
    """update() of the whole corpus rebuilds each shard graph under the
    same built-count doubling schedule as add(): early waves must be
    small (a Wmax-wide first wave against a near-empty graph builds a
    star and permanently degrades recall)."""
    devices = jax.devices()[:2]
    rng = np.random.default_rng(53)
    vecs = rng.random((240, DIM), dtype=np.float32)
    p = HNSWParameters(collection_size=256, max_wave_size=128)
    idx = ShardedIndex(DIM, parameters=p, devices=devices)
    gids = idx.add(vecs)

    idx._wave_trace = []                   # _drain_waves records widths
    new_vals = rng.random((240, DIM), dtype=np.float32)
    idx.update(gids, new_vals)
    sizes, idx._wave_trace = idx._wave_trace, None

    assert sizes, "update issued no waves"
    per_shard = np.stack(sizes)            # (waves, S)
    # first wave: at most 2 per shard (1 existing/seeded node each)
    assert per_shard[0].max() <= 2, per_shard[:, 0]
    # growth stays within the doubling schedule
    for s in range(per_shard.shape[1]):
        built = 2
        for w in per_shard[:, s]:
            assert w <= built, per_shard[:, s]
            built += int(w)

    assert idx.count == 240
    ri, _ = idx.knn_query(new_vals, 1)
    assert (ri[:, 0] == gids).mean() > 0.85


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs multiple devices")
def test_sharded_f64_refined_distances():
    """Returned distances are f64-refined: non-negative, ascending, and
    matching the direct formula (ADVICE round 1)."""
    devices = jax.devices()[:2]
    rng = np.random.default_rng(43)
    vecs = rng.random((200, DIM), dtype=np.float32)
    p = HNSWParameters(collection_size=256, max_wave_size=64)
    idx = ShardedIndex(DIM, parameters=p, devices=devices)
    gids = idx.add(vecs)
    q = rng.random((16, DIM), dtype=np.float32)
    ids, dists = idx.knn_query(q, k=5)
    assert np.nanmin(dists) >= 0.0
    S = idx.n_shards
    hv = idx._host_vecs()
    for r in range(16):
        for c in range(5):
            g = ids[r, c]
            if g < 0:
                continue
            ref = float(((q[r] - hv[g % S, g // S]) ** 2).sum())
            assert abs(ref - dists[r, c]) < 1e-4


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs multiple devices")
def test_sharded_packed_serving():
    """pack_queries='on' routes layer-0 graph queries through the packed
    per-shard engine (stacked QueryPack under shard_map); results must
    match the reference contract (self-recall, filters, invalidation on
    mutation) and agree with the unpacked beam at equal ef."""
    devices = jax.devices()[:4]
    rng = np.random.default_rng(11)
    vecs = rng.random((400, DIM), dtype=np.float32)
    p = HNSWParameters(collection_size=512, max_wave_size=128,
                       pack_queries="on")
    idx = ShardedIndex(DIM, parameters=p, devices=devices)
    gids = idx.add(vecs)

    ids, dists = idx.knn_query(vecs, k=1)
    assert idx._pack is not None, "packed path not engaged"
    assert (ids[:, 0] == gids).mean() > 0.85
    assert np.nanmin(dists) >= 0.0

    # unpacked agreement at equal ef
    p2 = HNSWParameters(collection_size=512, max_wave_size=128,
                        pack_queries="off", random_seed=p.random_seed)
    idx2 = ShardedIndex(DIM, parameters=p2, devices=devices)
    idx2.add(vecs)
    ids2, _ = idx2.knn_query(vecs, k=1)
    agree = (ids[:, 0] == ids2[:, 0]).mean()
    assert agree > 0.9, agree

    # filtered packed query: only allowed ids may return
    allow = gids[::2]
    fi, _ = idx.knn_query(vecs[:64], k=3, filter_fnc=allow)
    assert np.isin(fi[fi >= 0], allow).all()

    # mutation invalidates the pack, queries still correct afterwards
    idx.remove(gids[:50])
    assert idx._pack is None
    ri, _ = idx.knn_query(vecs[50:], k=1)
    assert idx._pack is not None
    assert (ri[:, 0] == gids[50:]).mean() > 0.85
    assert not np.isin(ri[:, 0], gids[:50]).any()


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs multiple devices")
def test_sharded_block_index():
    """ShardedBlockIndex: identical routing to the single-chip BlockIndex
    (replicated centroids + global top-n_probe), per-shard exact scoring,
    global merge.  Results must match BlockIndex bit-for-bit at equal
    parameters, clear the recall bar, and round-trip persistence."""
    from hnswindex_tpu import BlockIndex, ShardedBlockIndex

    devices = jax.devices()[:4]
    rng = np.random.default_rng(97)
    # clustered data: blocks are the serving mode for clustered corpora
    centers = rng.random((8, DIM)).astype(np.float32)
    vecs = (centers[rng.integers(0, 8, 800)]
            + 0.05 * rng.standard_normal((800, DIM)).astype(np.float32))
    q = vecs[:128]

    sb = ShardedBlockIndex(DIM, block_size=32, devices=devices)
    sb.build(vecs)
    ids, dists = sb.knn_query(q, k=5, n_probe=8)
    assert ids.shape == (128, 5)
    self_recall = float((ids[:, 0] == np.arange(128)).mean())
    assert self_recall > 0.95, self_recall
    assert np.nanmin(dists) >= 0.0

    # parity vs the single-chip BlockIndex at equal layout parameters
    bi = BlockIndex(DIM, block_size=32)
    bi.build(vecs)
    ids1, d1 = bi.knn_query(q, k=5, n_probe=8)
    agree = float((ids1 == ids).mean())
    assert agree > 0.99, agree

    # brute-force oracle recall at generous n_probe
    ids2, _ = sb.knn_query(q, k=10, n_probe=32)
    d2 = ((q[:, None, :] - vecs[None]) ** 2).sum(-1)
    oracle = np.argsort(d2, axis=1)[:, :10]
    rec = np.mean([len(set(a) & set(b)) / 10.0
                   for a, b in zip(ids2, oracle)])
    assert rec > 0.9, rec

    # persistence round-trip: identical results
    sb.serialize("/tmp/sb_test.npz")
    sb2 = ShardedBlockIndex.deserialize("/tmp/sb_test.npz",
                                        devices=devices)
    ids3, d3 = sb2.knn_query(q, k=5, n_probe=8)
    assert np.array_equal(ids3, ids)


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs multiple devices")
def test_sharded_block_index_edges():
    """Edge cases: corpus smaller than the shard count in blocks, k >
    count padding, non-default metric, input validation."""
    from hnswindex_tpu import ShardedBlockIndex

    devices = jax.devices()[:4]
    rng = np.random.default_rng(3)
    vecs = rng.random((10, DIM), dtype=np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)

    sb = ShardedBlockIndex(DIM, metric="ucosine", block_size=4,
                           devices=devices)
    with pytest.raises(RuntimeError):
        sb.knn_query(vecs, k=1)
    sb.build(vecs)
    ids, d = sb.knn_query(vecs, k=3, n_probe=100)   # n_probe > n_blocks
    assert (ids[:, 0] == np.arange(10)).all()
    ids2, d2 = sb.knn_query(vecs[:2], k=20, n_probe=4)  # k > count
    assert (ids2 == -1).any() and np.isnan(d2).any()
    with pytest.raises(ValueError):
        sb.build(np.zeros((4, DIM + 1), np.float32))
    with pytest.raises(ValueError):
        ShardedBlockIndex(DIM, metric="nope")


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs multiple devices")
def test_sharded_pack_auto_gating():
    """pack_queries='auto' (default) must stay unpacked below
    pack_min_count and never break queries."""
    devices = jax.devices()[:2]
    rng = np.random.default_rng(8)
    vecs = rng.random((150, DIM), dtype=np.float32)
    p = HNSWParameters(collection_size=256, max_wave_size=64)
    idx = ShardedIndex(DIM, parameters=p, devices=devices)
    gids = idx.add(vecs)
    ids, _ = idx.knn_query(vecs, k=1)
    assert idx._pack is None          # auto gating: corpus too small
    assert (ids[:, 0] == gids).mean() > 0.85


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs multiple devices")
def test_sharded_callable_filter_lazy():
    """Callable predicates evaluate lazily on candidates (no O(N) corpus
    sweep) for both knn and range queries, with correct results."""
    devices = jax.devices()[:2]
    rng = np.random.default_rng(21)
    vecs = rng.random((200, DIM), dtype=np.float32)
    p = HNSWParameters(collection_size=256, max_wave_size=64)
    idx = ShardedIndex(DIM, parameters=p, devices=devices)
    gids = idx.add(vecs)

    calls = []

    def pred(v):
        calls.append(1)
        return v[0] > 0.5

    ids, d = idx.knn_query(vecs[:16], k=3, filter_fnc=pred)
    # every returned id passes the predicate
    S = idx.n_shards
    hv = idx._host_vecs()
    for row in ids:
        for g in row[row >= 0]:
            assert hv[g % S, g // S][0] > 0.5
    # lazily evaluated: far fewer predicate calls than corpus size per
    # query batch (the eager mask would cost >= 200)
    assert 0 < len(calls) < 200 * 16

    rids, rds = idx.range_query(vecs[:4], radius=4.0, filter_fnc=pred)
    for row, dd in zip(rids, rds):
        for g, dist in zip(row, dd):
            assert hv[g % S, g // S][0] > 0.5
            assert dist <= 4.0


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs multiple devices")
def test_sharded_callable_filter_selective_fills_k():
    """A selective predicate (few passing rows) must still fill k on the
    mesh: when the widened beam saturates short, the sharded path now
    escalates to ONE exact top-cap round exactly like the single-chip
    facade (ADVICE r4 low — parity drift closed)."""
    devices = jax.devices()[:2]
    rng = np.random.default_rng(43)
    vecs = rng.random((300, DIM), dtype=np.float32)
    # make a small identifiable subset: first coordinate pushed far out
    special = rng.permutation(300)[:12]
    vecs[special, 0] += 10.0
    p = HNSWParameters(collection_size=512, max_wave_size=64)
    idx = ShardedIndex(DIM, parameters=p, devices=devices)
    gids = idx.add(vecs)

    def pred(v):
        return v[0] > 5.0

    # query from the bulk (far from the special set): the beam finds the
    # nearest neighbors first, none of which pass — only the exact
    # escalation can surface all 12 passing rows
    q = rng.random((4, DIM), dtype=np.float32)
    ids, d = idx.knn_query(q, k=10, filter_fnc=pred)
    special_gids = set(gids[special].tolist())
    for row in ids:
        got = [int(g) for g in row if g >= 0]
        assert len(got) == 10
        assert set(got) <= special_gids


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs multiple devices")
def test_sharded_build_recall_parity_with_single_chip():
    """VERDICT r3 #1 done-criterion: the mesh build uses the same exact
    MXU candidate path as the single-chip engine, so at equal parameters
    its graph recall must match the single-chip build (each shard solves
    a smaller exact subproblem — no beam-quality regression allowed)."""
    from hnswindex_tpu import HNSWIndex

    devices = jax.devices()[:4]
    rng = np.random.default_rng(1234)
    n, k = 800, 10
    # clustered corpus: the regime where beam-vs-exact candidates differ
    centers = rng.normal(size=(8, DIM)).astype(np.float32) * 2.0
    vecs = (centers[rng.integers(0, 8, n)]
            + rng.normal(size=(n, DIM)).astype(np.float32))
    q = (centers[rng.integers(0, 8, 64)]
         + rng.normal(size=(64, DIM)).astype(np.float32))

    p = HNSWParameters(collection_size=n, max_wave_size=128, random_seed=9)
    sh = ShardedIndex(DIM, parameters=p, devices=devices)
    sg = sh.add(vecs)
    si, _ = sh.knn_query(q, k=k)

    single = HNSWIndex(DIM, parameters=p)
    ug = single.add(vecs)
    ui, _ = single.knn_query(q, k=k)

    d_all = ((q[:, None, :] - vecs[None, :, :]) ** 2).sum(-1)
    truth = np.argsort(d_all, axis=1)[:, :k]
    pos_s = {int(g): j for j, g in enumerate(sg)}
    pos_u = {int(g): j for j, g in enumerate(ug)}
    rec_s = np.mean([len({pos_s[int(g)] for g in row if g >= 0}
                         & set(t.tolist())) / k
                     for row, t in zip(si, truth)])
    rec_u = np.mean([len({pos_u[int(g)] for g in row if g >= 0}
                         & set(t.tolist())) / k
                     for row, t in zip(ui, truth)])
    assert rec_s >= rec_u - 0.03, (rec_s, rec_u)
    assert rec_s > 0.9, rec_s


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs multiple devices")
def test_sharded_waves_are_upload_free(monkeypatch):
    """VERDICT r3 #1 done-criterion: zero per-wave host->device
    arguments.  Host->device transfers during a drain must scale with the
    slab count, not the wave count (each upload costs 30-130 ms through
    a tunneled backend)."""
    import hnswindex_tpu.parallel.sharded as SH

    devices = jax.devices()[:2]
    rng = np.random.default_rng(77)
    n = 512
    vecs = rng.random((n, DIM), dtype=np.float32)
    p = HNSWParameters(collection_size=n, max_wave_size=16)  # many waves
    idx = ShardedIndex(DIM, parameters=p, devices=devices)

    uploads = []
    real = SH.jnp.asarray
    active = []

    def counting(x, *a, **kw):
        if active:
            uploads.append(1)
        return real(x, *a, **kw)

    orig_drain = idx._drain_waves

    def drain(*a, **kw):
        active.append(1)
        try:
            return orig_drain(*a, **kw)
        finally:
            active.pop()

    monkeypatch.setattr(SH.jnp, "asarray", counting)
    monkeypatch.setattr(idx, "_drain_waves", drain)
    idx._wave_trace = []
    idx.add(vecs)
    waves = len(idx._wave_trace)
    idx._wave_trace = None
    monkeypatch.undo()

    assert waves > 10, waves       # the throttle must actually wave
    # one slab: ids/levels/vectors/ntot + one upper panel (+ tiny consts);
    # strictly wave-count independent
    assert len(uploads) <= 8, (len(uploads), waves)
    assert len(uploads) < waves


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs multiple devices")
def test_sharded_refinement_bounded_memory(monkeypatch):
    """VERDICT r3 #3 done-criterion: with a corpus 'too large to mirror'
    (cap monkeypatched to 0) every query path still returns correctly
    refined results, with NO full-corpus device->host transfer."""
    import hnswindex_tpu.parallel.sharded as SH

    devices = jax.devices()[:4]
    rng = np.random.default_rng(4242)
    n, k = 500, 5
    vecs = rng.random((n, DIM), dtype=np.float32)
    q = rng.random((20, DIM), dtype=np.float32)
    p = HNSWParameters(collection_size=n, max_wave_size=128, random_seed=3)

    def run(idx):
        gids = idx.add(vecs)
        ki, kd = idx.knn_query(q, k=k)
        ei, ed = idx.knn_query(q, k=k, exact=True)
        ri, rd = idx.range_query(q[:4], radius=3.0)
        fi, fd = idx.knn_query(q[:4], k=3, filter_fnc=lambda v: v[0] > 0.5)
        return gids, ki, kd, ei, ed, ri, rd, fi, fd

    ref = run(ShardedIndex(DIM, parameters=p, devices=devices))

    monkeypatch.setattr(SH, "MIRROR_MAX_BYTES", 0)
    idx = ShardedIndex(DIM, parameters=p, devices=devices)

    def no_mirror():
        raise AssertionError("full-corpus mirror above the budget")

    monkeypatch.setattr(idx, "_host_vecs", no_mirror)
    got = run(idx)

    assert np.array_equal(ref[0], got[0])
    assert np.array_equal(ref[1], got[1])          # knn ids
    assert np.allclose(ref[2], got[2], rtol=1e-4, atol=1e-5,
                       equal_nan=True)             # knn dists (f64 vs f32)
    assert np.array_equal(ref[3], got[3])          # exact ids
    assert np.allclose(ref[4], got[4], rtol=1e-4, atol=1e-5, equal_nan=True)
    for a, b in zip(ref[5], got[5]):               # range ids (ragged)
        assert np.array_equal(a, b)
    for a, b in zip(ref[6], got[6]):
        assert np.allclose(a, b, rtol=1e-4, atol=1e-5)
    assert np.array_equal(ref[7], got[7])          # filtered ids
    # items() stays available above the budget (bounded chunk gathers)
    it = idx.items()
    assert it.shape == (n, DIM)
    gid_to_vec = {int(g): vecs[j] for j, g in enumerate(got[0])}
    expect = np.stack([gid_to_vec[int(g)] for g in idx.ids()])
    assert np.allclose(it, expect, atol=1e-6)


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs multiple devices")
def test_sharded_block_dynamics(tmp_path):
    """VERDICT r2 #8 (sharded tier): incremental add/remove/update on the
    mesh-sharded block tables, persistence of the mutated layout, and the
    rebuild trigger."""
    from hnswindex_tpu import ShardedBlockIndex

    devices = jax.devices()[:2]
    rng = np.random.default_rng(404)
    base = rng.random((300, DIM), dtype=np.float32)
    sb = ShardedBlockIndex(DIM, block_size=32, devices=devices)
    sb.build(base)
    assert sb.count == 300

    far = rng.random((120, DIM), dtype=np.float32) + 2.5
    fids = sb.add(far)
    assert sb.count == 420
    assert np.array_equal(fids, np.arange(300, 420))
    ids, d = sb.knn_query(far[:24], k=1, n_probe=8)
    assert (ids[:, 0] == fids[:24]).mean() > 0.9

    sb.remove(fids[:60])
    assert sb.count == 360
    ids2, _ = sb.knn_query(far[:24], k=3, n_probe=8)
    assert not np.isin(ids2[ids2 >= 0], fids[:60]).any()

    moved = base[:10] + 5.0
    sb.update(np.arange(10), moved)
    ui, ud = sb.knn_query(moved, k=1, n_probe=8)
    assert (ui[:, 0] == np.arange(10)).mean() > 0.85
    assert np.nanmax(ud[:, 0]) < 1e-3

    # mutated layout round-trips exactly
    path = str(tmp_path / "sbdyn.npz")
    sb.serialize(path)
    back = ShardedBlockIndex.deserialize(path, devices=devices)
    assert back.count == sb.count
    a = sb.knn_query(base[:32], k=5, n_probe=8)
    b = back.knn_query(base[:32], k=5, n_probe=8)
    assert np.array_equal(a[0], b[0])

    # churn past the trigger, then rebuild preserves ids + recall
    sb.remove(np.arange(10, 200))
    assert sb.needs_rebuild()
    sb.rebuild()
    assert not sb.needs_rebuild()
    live = np.concatenate([np.arange(10), np.arange(200, 300),
                           fids[60:]])
    assert sb.count == live.size
    li, _ = sb.knn_query(far[60 - 120:], k=1, n_probe=8)
    assert (li[:, 0] == fids[60:]).mean() > 0.9


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 devices")
def test_sharded_remove_is_spmd_not_serial():
    """Removal repair is one launch per phase covering ALL shards
    (VERDICT r4 #5): removing a load spread over 4 shards issues about
    as many device launches as the same PER-SHARD load concentrated on
    one shard — a serial per-shard loop would issue ~4x."""
    devices = jax.devices()[:4]
    rng = np.random.default_rng(51)
    vecs = rng.random((400, DIM), dtype=np.float32)
    p = HNSWParameters(collection_size=512, max_wave_size=64,
                       random_seed=3)

    def build():
        ix = ShardedIndex(DIM, parameters=p, devices=devices)
        ix.add(vecs)
        return ix

    # (a) even spread: 80 ids round-robin over all 4 shards
    a = build()
    a._rm_trace = []
    a.remove(np.arange(80))
    spread = len(a._rm_trace)

    # (b) concentrated: 20 ids, all owned by shard 0 (gid % 4 == 0)
    b = build()
    b._rm_trace = []
    b.remove(np.arange(0, 80, 4))
    single = len(b._rm_trace)

    assert spread <= single * 2, (spread, single)
    # results stay correct after the SPMD removal
    live = np.arange(80, 400)
    ids, _ = a.knn_query(vecs[live], 1)
    assert (ids[:, 0] == live).mean() > 0.85
