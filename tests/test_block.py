"""BlockIndex: recall vs brute force on clustered data, exactness when
probing all blocks, both routers."""

import numpy as np
import pytest

from hnswindex_tpu.block import BlockIndex
from hnswindex_tpu.params import HNSWParameters

DIM = 32


def clustered(n, dim, n_centers, rng, spread=0.05):
    centers = rng.random((n_centers, dim)).astype(np.float32)
    who = rng.integers(0, n_centers, n)
    return (centers[who]
            + spread * rng.standard_normal((n, dim)).astype(np.float32))


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(65537)
    vecs = clustered(3000, DIM, 40, rng)
    q = clustered(100, DIM, 40, np.random.default_rng(7))
    d = ((q[:, None, :].astype(np.float64)
          - vecs[None, :, :].astype(np.float64)) ** 2).sum(-1)
    gt = np.argsort(d, axis=1)[:, :10]
    return vecs, q, gt


def overlap(ids, gt):
    k = gt.shape[1]
    return np.mean([len(set(ids[r].tolist()) & set(gt[r].tolist())) / k
                    for r in range(gt.shape[0])])


def test_block_recall_sweep(data):
    vecs, q, gt = data
    ix = BlockIndex(DIM, block_size=64)
    ix.build(vecs)
    assert ix.count == 3000
    r8 = overlap(ix.knn_query(q, 10, n_probe=8)[0], gt)
    r32 = overlap(ix.knn_query(q, 10, n_probe=32)[0], gt)
    assert r32 >= r8
    assert r32 > 0.9, (r8, r32)


def test_block_all_probes_is_exact(data):
    vecs, q, gt = data
    ix = BlockIndex(DIM, block_size=64)
    ix.build(vecs)
    ids, dists = ix.knn_query(q, 10, n_probe=ix.n_blocks)
    assert overlap(ids, gt) > 0.999
    assert np.all(np.diff(dists, axis=1) >= -1e-6)


def test_block_hnsw_router(data):
    vecs, q, gt = data
    ix = BlockIndex(DIM, block_size=64, router="hnsw",
                    parameters=HNSWParameters(random_seed=7))
    ix.build(vecs)
    r = overlap(ix.knn_query(q, 10, n_probe=32)[0], gt)
    assert r > 0.85, r


def test_block_padding_and_validation():
    rng = np.random.default_rng(3)
    vecs = rng.random((150, DIM), dtype=np.float32)
    ix = BlockIndex(DIM, block_size=64)
    ix.build(vecs)
    ids, dists = ix.knn_query(vecs[:5], k=200, n_probe=ix.n_blocks)
    assert np.all(ids[:, 150:] == -1)
    assert np.all(np.isnan(dists[:, 150:]))
    with pytest.raises(RuntimeError):
        BlockIndex(DIM).knn_query(vecs[:1], 1)
    with pytest.raises(ValueError):
        BlockIndex(DIM, router="bogus")


def test_block_serialize_roundtrip(data, tmp_path):
    vecs, q, gt = data
    ix = BlockIndex(DIM, block_size=64)
    ix.build(vecs)
    path = str(tmp_path / "block.npz")
    ix.serialize(path)
    r = BlockIndex.deserialize(path)
    a = ix.knn_query(q, 10, n_probe=32)
    b = r.knn_query(q, 10, n_probe=32)
    assert np.array_equal(a[0], b[0])
    assert np.array_equal(a[1], b[1], equal_nan=True)


def test_block_serialize_roundtrip_without_extension(data, tmp_path):
    # np.savez appends ".npz"; deserialize must accept the original path
    vecs, q, gt = data
    ix = BlockIndex(DIM, block_size=64)
    ix.build(vecs)
    path = str(tmp_path / "block_noext")
    ix.serialize(path)
    r = BlockIndex.deserialize(path)
    a = ix.knn_query(q, 10, n_probe=8)
    b = r.knn_query(q, 10, n_probe=8)
    assert np.array_equal(a[0], b[0])


def test_block_hnsw_router_roundtrip_preserves_seed(data, tmp_path):
    # the reloaded router must be rebuilt with the original random_seed so
    # routing (and therefore results) match the pre-snapshot index exactly
    vecs, q, gt = data
    ix = BlockIndex(DIM, block_size=64, router="hnsw",
                    parameters=HNSWParameters(random_seed=7))
    ix.build(vecs)
    path = str(tmp_path / "block_hnsw.npz")
    ix.serialize(path)
    r = BlockIndex.deserialize(path)
    assert r.params.random_seed == 7
    a = ix.knn_query(q, 10, n_probe=8)
    b = r.knn_query(q, 10, n_probe=8)
    assert np.array_equal(a[0], b[0])
    assert np.array_equal(a[1], b[1], equal_nan=True)


def test_block_tiny_shapes_no_div_by_zero():
    # block_size * dim < 128 used to ZeroDivisionError in _score_blocks
    rng = np.random.default_rng(5)
    vecs = rng.random((64, 16), dtype=np.float32)
    ix = BlockIndex(16, block_size=4)
    ix.build(vecs)
    ids, dists = ix.knn_query(vecs[:3], k=2, n_probe=ix.n_blocks)
    assert np.array_equal(ids[:, 0], np.arange(3))


def test_block_dynamic_add_remove_update(data):
    """VERDICT r2 #8: the block tier accepts incremental mutation —
    appends into nearest blocks, swap-compacted removals, in-place
    updates — keeping recall without a full rebuild."""
    vecs, q, gt = data
    rng = np.random.default_rng(99)
    half = vecs[:2000]
    ix = BlockIndex(DIM, parameters=HNSWParameters(random_seed=5),
                    block_size=64)
    ix.build(half)
    assert ix.count == 2000

    # dynamic append of the second half
    new_ids = ix.add(vecs[2000:])
    assert ix.count == 3000
    assert np.array_equal(new_ids, np.arange(2000, 3000))
    ids, d = ix.knn_query(q, k=10, n_probe=16)
    rec = np.mean([len(set(a.tolist()) & set(b.tolist())) / 10
                   for a, b in zip(ids, gt)])
    assert rec > 0.9, rec

    # remove a third; removed ids never come back
    drop = rng.choice(3000, 1000, replace=False)
    ix.remove(drop)
    assert ix.count == 2000
    ids2, _ = ix.knn_query(q, k=10, n_probe=16)
    assert not np.isin(ids2[ids2 >= 0], drop).any()
    keep = np.setdiff1d(np.arange(3000), drop)
    d2 = ((q[:, None, :].astype(np.float64)
           - vecs[keep][None, :, :].astype(np.float64)) ** 2).sum(-1)
    gt2 = keep[np.argsort(d2, axis=1)[:, :10]]
    rec2 = np.mean([len(set(a.tolist()) & set(b.tolist())) / 10
                    for a, b in zip(ids2, gt2)])
    assert rec2 > 0.9, rec2

    # update: vectors move, same ids, queries track the move
    upd = keep[:50]
    moved = vecs[keep[:50]] + 10.0     # far away from everything else
    ix.update(upd, moved)
    assert ix.count == 2000
    ui, ud = ix.knn_query(moved[:8], k=1, n_probe=16)
    assert (ui[:, 0] == upd[:8]).mean() > 0.85
    # self-distance ~0 after the move
    assert np.nanmax(ud[:, 0]) < 1e-3

    # removed-id adds never recycle ids
    more = ix.add(vecs[:10])
    assert more.min() >= 3000


def test_block_dynamic_growth_and_rebuild():
    """Adds beyond every block's capacity open fresh blocks (device
    tables grow); rebuild() re-layouts in place preserving ids."""
    rng = np.random.default_rng(3)
    base = rng.random((200, DIM), dtype=np.float32)
    ix = BlockIndex(DIM, parameters=HNSWParameters(random_seed=5),
                    block_size=16)
    ix.build(base)
    nb0 = ix.n_blocks
    extra = rng.random((400, DIM), dtype=np.float32) + 2.0  # far cluster
    eids = ix.add(extra)
    assert ix.count == 600
    assert ix.n_blocks > nb0          # fresh blocks were opened
    ids, _ = ix.knn_query(extra[:32], k=1, n_probe=16)
    assert (ids[:, 0] == eids[:32]).mean() > 0.9
    assert ix.needs_rebuild()         # count tripled since layout
    ix.rebuild()
    assert ix.count == 600
    assert not ix.needs_rebuild()
    ids2, _ = ix.knn_query(extra[:32], k=1, n_probe=16)
    assert (ids2[:, 0] == eids[:32]).mean() > 0.9


def test_block_dynamic_hnsw_router():
    """Dynamics mark the centroid router dirty; the next query rebuilds
    it and routes correctly."""
    rng = np.random.default_rng(11)
    base = rng.random((500, DIM), dtype=np.float32)
    ix = BlockIndex(DIM, parameters=HNSWParameters(random_seed=5),
                    block_size=32, router="hnsw")
    ix.build(base)
    far = rng.random((100, DIM), dtype=np.float32) + 3.0
    fids = ix.add(far)
    ids, _ = ix.knn_query(far[:16], k=1, n_probe=8)
    assert (ids[:, 0] == fids[:16]).mean() > 0.9
    ix.remove(fids)
    ids2, _ = ix.knn_query(base[:16], k=1, n_probe=8)
    assert (ids2[:, 0] == np.arange(16)).mean() > 0.85
    assert not np.isin(ids2[ids2 >= 0], fids).any()


def test_block_batched_add_moment_consistency(data):
    """The batched add path maintains centroids/radii incrementally
    (running moments); they must stay numerically equal to a direct
    recompute over the block members — a double-count here silently
    fragments placement (round-5 bug: recall fell 0.93 -> 0.74)."""
    vecs, q, gt = data
    ix = BlockIndex(DIM, parameters=HNSWParameters(random_seed=5),
                    block_size=64)
    ix.build(vecs[:2000])
    ix.add(vecs[2000:])
    for b in range(ix.n_blocks):
        f = int(ix._h_fill[b])
        if f == 0:
            continue
        c = ix._h_vecs[b, :f].mean(axis=0)
        r2 = ((ix._h_vecs[b, :f] - c) ** 2).sum(1).mean()
        assert np.abs(ix._h_cents[b] - c).max() < 1e-4
        assert abs(float(ix._h_r2[b]) - r2) < 1e-3
    # placement stays compact: the 1000-row append must not shatter into
    # per-row singleton blocks
    fills = ix._h_fill[ix._h_fill > 0]
    assert (fills == 1).sum() < 50, int((fills == 1).sum())


def test_block_size_192(data):
    """The bench's preferred 192-row geometry (benchmarks/RESULTS.md
    round-5 sweep) works on the non-Pallas path too: recall tracks the
    128-row default at matched probes."""
    vecs, q, gt = data
    ix = BlockIndex(DIM, block_size=192)
    ix.build(vecs)
    ids, d = ix.knn_query(q, 10, n_probe=8)
    assert overlap(ids, gt) > 0.9
    ids2, _ = ix.knn_query(q, 10, n_probe=ix.n_blocks)   # all blocks
    assert overlap(ids2, gt) > 0.99
