"""Native C++ host engine: recall bars, parity with the TPU engine, and
the reference C-ABI semantics (staged setters, -1/NaN padding, removals)."""

import numpy as np
import pytest

from hnswindex_tpu.native.host_engine import HostIndex

DIM = 64
N = 2000


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(65537)
    return rng.random((N, DIM), dtype=np.float32)


def test_host_recall(corpus):
    ix = HostIndex(DIM)
    ix.set_collection_size(N)
    ix.set_random_seed(31337)
    ids = ix.add(corpus)
    rid = ix.knn_query(corpus, 1)[0][:, 0]
    recall = (rid == ids).mean()
    assert recall > 0.85, recall
    assert ix.count == N


def test_host_metric_oracle(corpus):
    for metric in ("sq_euclid", "cosine", "ucosine"):
        vecs = corpus[:200].copy()
        if metric == "ucosine":
            vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
        ix = HostIndex(DIM, metric)
        ids = ix.add(vecs)
        rids, dists = ix.knn_query(vecs, 2)
        by_id = {int(i): vecs[j] for j, i in enumerate(ids)}
        for i in range(0, 200, 23):
            x = vecs[i].astype(np.float64)
            y = by_id[int(rids[i, 1])].astype(np.float64)
            if metric == "sq_euclid":
                want = float(np.dot(x - y, x - y))
            else:
                cos = np.dot(x, y) / (np.linalg.norm(x) * np.linalg.norm(y))
                want = 1.0 - float(np.clip(cos, -1, 1))
            assert np.isclose(dists[i, 1], want, rtol=0, atol=1e-4)


def test_host_padding_and_setters(corpus):
    ix = HostIndex(DIM)
    ix.set_collection_size(8)
    ix.add(corpus[:3])
    ids, dists = ix.knn_query(corpus[:2], 6)
    assert np.all(ids[:, 3:] == -1)
    assert np.all(np.isnan(dists[:, 3:]))
    with pytest.raises(RuntimeError):
        ix.set_max_edges(8)  # after init


def test_host_remove_and_range(corpus):
    ix = HostIndex(DIM)
    ix.set_collection_size(512)
    ids = ix.add(corpus[:512])
    ix.remove(ids[:256])
    assert ix.count == 256
    rid = ix.knn_query(corpus[256:512], 1)[0][:, 0]
    assert (rid == ids[256:]).mean() > 0.9
    assert not np.isin(rid, ids[:256]).any()

    radius = 9.0
    r_ids, r_d = ix.range_query(corpus[256:260], radius)
    for i in range(4):
        assert np.all(r_d[i] <= radius)
        assert not np.isin(r_ids[i], ids[:256]).any()


def test_host_remove_disabled(corpus):
    ix = HostIndex(DIM)
    ix.set_allow_removals(False)
    ids = ix.add(corpus[:64])
    with pytest.raises(RuntimeError):
        ix.remove(ids[:2])


def test_host_serialize_roundtrip(corpus, tmp_path):
    ix = HostIndex(DIM)
    ix.set_collection_size(256)
    ids = ix.add(corpus[:256])
    path = str(tmp_path / "host.bin")
    ix.serialize(path)
    r = HostIndex.deserialize(path, DIM)
    a1 = ix.knn_query(corpus[:64], 5)
    a2 = r.knn_query(corpus[:64], 5)
    assert np.array_equal(a1[0], a2[0])
    assert np.array_equal(a1[1], a2[1], equal_nan=True)
    assert r.count == 256


def test_host_vs_tpu_engine_agree(corpus):
    """The two engines are independent implementations of the same
    algorithm — their recall and their top-1 answers should agree almost
    everywhere (graphs differ, true neighbors dominate)."""
    from hnswindex_tpu import Index

    vecs = corpus[:500]
    host = HostIndex(DIM)
    host.set_collection_size(500)
    hids = host.add(vecs)

    tpu = Index(DIM)
    tpu.set_collection_size(500)
    tids = tpu.add(vecs)

    hr = host.knn_query(vecs, 1)[0][:, 0]
    tr = tpu.knn_query(vecs, 1)[0][:, 0]
    host_recall = (hr == hids).mean()
    tpu_recall = (tr == tids).mean()
    assert host_recall > 0.9
    assert tpu_recall > 0.9
    # top-1 answers map to the same original row for >=90% of queries
    h2row = {int(h): i for i, h in enumerate(hids)}
    t2row = {int(t): i for i, t in enumerate(tids)}
    agree = np.mean([h2row[int(a)] == t2row[int(b)]
                     for a, b in zip(hr, tr)])
    assert agree > 0.9, agree


def test_host_snapshot_imports_into_tpu_engine(corpus, tmp_path):
    """Cross-engine migration: build with the native C++ engine, serve
    with the JAX/TPU engine."""
    from hnswindex_tpu.index import HNSWIndex as TPUIndex

    vecs = corpus[:400]
    host = HostIndex(DIM)
    host.set_collection_size(512)
    hids = host.add(vecs)
    path = str(tmp_path / "xengine.bin")
    host.serialize(path)

    tpu = TPUIndex.from_host_snapshot(path)
    assert tpu.count == 400
    rid = tpu.knn_query(vecs, 1)[0][:, 0]
    assert (rid == hids).mean() > 0.9
    # still mutable after import
    extra = np.random.default_rng(8).random((30, DIM), dtype=np.float32)
    nid = tpu.add(extra)
    assert tpu.count == 430
    rid2 = tpu.knn_query(extra, 1)[0][:, 0]
    assert (rid2 == nid).mean() > 0.8
