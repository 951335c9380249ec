"""Additional reference-parity behaviors.

- batched query == repeated single query (the analog of the reference's
  exact parallel-vs-serial equality, GraphTests.cs:83-120: our "threads"
  are query buckets, and bucketing must not change results);
- AllowRemovals=false reports zero in-edge statistics
  (ParametersTests.cs:73-87 with empty InEdges lists);
- cosine-metric end-to-end build (GraphTests/ParametersTests all use
  cosine).
"""

import numpy as np
import pytest

from hnswindex_tpu import Index

DIM = 48
N = 400


@pytest.fixture(scope="module")
def built():
    rng = np.random.default_rng(65537)
    vecs = rng.random((N, DIM), dtype=np.float32)
    index = Index(DIM)
    index.set_collection_size(N)
    ids = index.add(vecs)
    return index, vecs, ids


def test_batched_equals_single_queries(built):
    index, vecs, ids = built
    # one big batch (one device program) vs per-query calls (different
    # bucket shapes): results must be identical (GraphTests.cs:113-119)
    big_ids, big_d = index.knn_query(vecs[:40], 10)
    for i in range(40):
        one_ids, one_d = index.knn_query(vecs[i], 10)
        assert np.array_equal(one_ids[0], big_ids[i]), i
        assert np.array_equal(one_d[0], big_d[i], equal_nan=True), i


def test_repeated_query_deterministic(built):
    index, vecs, ids = built
    a = index.knn_query(vecs[:100], 5)
    b = index.knn_query(vecs[:100], 5)
    assert np.array_equal(a[0], b[0])
    assert np.array_equal(a[1], b[1], equal_nan=True)


def test_no_removals_zero_in_edges():
    rng = np.random.default_rng(3)
    vecs = rng.random((300, DIM), dtype=np.float32)
    index = Index(DIM)
    index.set_collection_size(300)
    index.set_allow_removals(False)
    index.add(vecs)
    info = index.get_info()
    for li in info.layers:
        assert li.max_in_edges == 0
        assert li.avg_in_edges == 0
        assert li.in_edges_median == 0
        assert li.max_out_edges > 0


def test_cosine_build_recall():
    rng = np.random.default_rng(11)
    vecs = rng.random((N, DIM), dtype=np.float32)
    index = Index(DIM, metric="cosine")
    index.set_collection_size(N)
    ids = index.add(vecs)
    rid = index.knn_query(vecs, 1)[0][:, 0]
    assert (rid == ids).mean() > 0.85


def test_single_item_and_growth_edges():
    rng = np.random.default_rng(13)
    index = Index(DIM)
    index.set_collection_size(2)
    v = rng.random((1, DIM), dtype=np.float32)
    ids = index.add(v)
    assert index.count == 1
    rid, rd = index.knn_query(v, 1)
    assert rid[0, 0] == ids[0]
    assert rd[0, 0] == pytest.approx(0.0, abs=1e-5)
    # grow through several capacity doublings
    more = rng.random((70, DIM), dtype=np.float32)
    mids = index.add(more)
    assert index.count == 71
    rid = index.knn_query(more, 1)[0][:, 0]
    assert (rid == mids).mean() > 0.85
