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
