"""Exact MXU brute-force path: recall 1.0 vs a NumPy oracle, filters,
removal awareness."""

import numpy as np
import pytest

from hnswindex_tpu import Index

DIM = 32
N = 400


@pytest.fixture(scope="module")
def built():
    rng = np.random.default_rng(42)
    vecs = rng.random((N, DIM), dtype=np.float32)
    index = Index(DIM)
    index.set_collection_size(N)
    ids = index.add(vecs)
    return index, vecs, ids


def test_exact_matches_numpy(built):
    index, vecs, ids = built
    q = vecs[:64]
    got_ids, got_d = index.knn_query(q, 5, exact=True)
    d = ((q[:, None, :].astype(np.float64)
          - vecs[None, :, :].astype(np.float64)) ** 2).sum(-1)
    want = ids[np.argsort(d, axis=1)[:, :5]]
    assert np.array_equal(got_ids, want)
    assert np.all(np.diff(got_d, axis=1) >= 0)


def test_exact_respects_removals(built):
    index, vecs, ids = built
    index._impl  # built fixture shared; use a fresh index for removal
    rng = np.random.default_rng(1)
    v2 = rng.random((100, DIM), dtype=np.float32)
    ix = Index(DIM)
    ix.set_collection_size(128)
    i2 = ix.add(v2)
    ix.remove(i2[:50])
    got, _ = ix.knn_query(v2[50:], 3, exact=True)
    assert not np.isin(got[got >= 0], i2[:50]).any()
    assert (got[:, 0] == i2[50:]).all()


def test_exact_with_filter(built):
    index, vecs, ids = built
    allowed = ids[ids % 3 == 0]
    got, _ = index.knn_query(vecs[:16], 4, exact=True, filter_fnc=allowed)
    valid = got[got >= 0]
    assert valid.size > 0
    assert np.all(valid % 3 == 0)


def test_exact_padding_when_k_exceeds_count():
    ix = Index(DIM)
    rng = np.random.default_rng(2)
    v = rng.random((3, DIM), dtype=np.float32)
    ix.add(v)
    got, d = ix.knn_query(v[:2], 6, exact=True)
    assert np.all(got[:, 3:] == -1)
    assert np.all(np.isnan(d[:, 3:]))


def test_exact_padding_when_k_exceeds_capacity():
    """k larger than the whole capacity: the scorer returns fewer than k
    candidate columns and the refine layer must pad, not crash."""
    ix = Index(DIM)
    ix.set_collection_size(2)
    rng = np.random.default_rng(5)
    v = rng.random((2, DIM), dtype=np.float32)
    ix.add(v)
    got, d = ix.knn_query(v, 5, exact=True)
    assert got.shape == (2, 5) and d.shape == (2, 5)
    assert (got[:, :2] >= 0).all()
    assert np.all(got[:, 2:] == -1)
    assert np.all(np.isnan(d[:, 2:]))
    # graph path agrees on the same contract
    got2, d2 = ix.knn_query(v, 5)
    assert got2.shape == (2, 5)
    assert np.all(got2[:, 2:] == -1)
