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
