"""Serialization round-trip (GraphSerializationTests.cs:29-42), range
queries (GraphTests.cs:228-244), degree stats (GraphTests.cs edge-balance
invariant) and connected components (GraphTests.cs:247-273)."""

import numpy as np
import pytest

from hnswindex_tpu import Index

DIM = 48
N = 500


@pytest.fixture(scope="module")
def built():
    rng = np.random.default_rng(65537)
    vecs = rng.random((N, DIM), dtype=np.float32)
    index = Index(DIM)
    index.set_collection_size(N)
    ids = index.add(vecs)
    return index, vecs, ids


def test_serialize_roundtrip_exact(built, tmp_path):
    index, vecs, ids = built
    path = str(tmp_path / "index.npz")
    index.serialize(path)
    restored = Index.deserialize(path)

    # GraphSerializationTests.cs:32-42: identical ids AND distances, k=5
    ids1, d1 = index.knn_query(vecs, 5)
    ids2, d2 = restored.knn_query(vecs, 5)
    assert np.array_equal(ids1, ids2)
    assert np.array_equal(d1, d2, equal_nan=True)
    assert restored.count == index.count
    assert np.array_equal(restored.ids(), index.ids())


def test_serialize_roundtrip_without_extension(built, tmp_path):
    # np.savez appends ".npz"; deserialize must accept the original path
    index, vecs, ids = built
    path = str(tmp_path / "index_noext")
    index.serialize(path)
    restored = Index.deserialize(path)
    ids1, d1 = index.knn_query(vecs[:20], 5)
    ids2, d2 = restored.knn_query(vecs[:20], 5)
    assert np.array_equal(ids1, ids2)
    assert np.array_equal(d1, d2, equal_nan=True)


def test_deserialize_unknown_metric_fails_at_load(built, tmp_path):
    # the metric name is revalidated on load: a snapshot built with a
    # custom metric must fail with a clear error if the metric is not
    # re-registered in the loading process (HNSWIndex.cs:222 analog)
    from hnswindex_tpu.ops import distance as dst

    index, vecs, ids = built
    path = str(tmp_path / "badmetric.npz")
    index.serialize(path)
    name = "test_vanishing_metric"
    dst.register_metric(name, lambda a, b: ((a - b) ** 2).sum(-1))
    try:
        import json

        import numpy as _np
        with _np.load(path) as z:
            arrays = {f: z[f] for f in z.files}
        header = json.loads(bytes(arrays["header"]).decode())
        header["metric"] = name
        arrays["header"] = _np.frombuffer(
            json.dumps(header).encode(), dtype=_np.uint8)
        _np.savez_compressed(path, **arrays)
    finally:
        dst._CUSTOM_METRICS.pop(name, None)
    with pytest.raises(ValueError, match="unknown metric"):
        Index.deserialize(path)


def test_serialized_index_still_mutable(built, tmp_path):
    index, vecs, ids = built
    path = str(tmp_path / "index2.npz")
    index.serialize(path)
    restored = Index.deserialize(path)
    rng = np.random.default_rng(1)
    extra = rng.random((40, DIM), dtype=np.float32)
    new_ids = restored.add(extra)
    assert restored.count == index.count + 40
    rid = restored.knn_query(extra, 1)[0][:, 0]
    assert (rid == new_ids).mean() > 0.85


def test_range_query_within_radius(built):
    index, vecs, ids = built
    # the reference test uses radius 16 on 128-d data where the mean
    # pairwise distance is ~21 (recall_test.py:48-56) — i.e. a radius
    # capturing a well-connected in-range region.  Mirror that proportion.
    radius = float(np.quantile(
        ((vecs[:50, None, :] - vecs[None, :50, :]) ** 2).sum(-1), 0.3))
    r_ids, r_d = index.range_query(vecs[:50], radius)
    assert len(r_ids) == 50
    hits = 0
    for i in range(50):
        assert np.all(r_d[i] <= radius)        # GraphTests.cs:240-243
        assert np.all(np.diff(r_d[i]) >= 0)
        assert ids[i] in r_ids[i]              # self is within any radius>0
        hits += len(r_ids[i])
    assert hits > 50  # found more than just self overall


def test_get_info_edge_balance(built):
    index, _, _ = built
    info = index.get_info()
    assert len(info.layers) >= 1
    total = 0
    for li in info.layers:
        assert li.nodes_count > 0
        # layer 0 may transiently exceed 2M by the effective reverse
        # slack between overflow re-prunes (params.reverse_slack)
        cap = 32 + index._impl._cfg.slack0 if li.layer_id == 0 else 16
        assert li.max_out_edges <= cap
        # in/out edge totals balance per layer (GraphTests.cs:34-36
        # invariant AvgOutEdges == AvgInEdges) — exact because in-degrees
        # are recovered from the same out-edge table.
        assert li.avg_out_edges == pytest.approx(li.avg_in_edges)
        total += li.nodes_count
    assert info.layers[0].nodes_count == index.count


def test_connected_components(built):
    index, _, _ = built
    counts = index.get_connected_component_counts()
    # seeded random build -> a single component per layer
    # (GraphTests.cs:253-273)
    assert len(counts) >= 1
    assert all(c == 1 for c in counts), counts


def test_components_empty_graph():
    index = Index(DIM)
    # uninitialized -> empty list (GraphTests.cs:247-251)
    assert index.get_connected_component_counts() == []


def test_components_chain_graph_converges_fast():
    """Adversarial diameter: a pure chain (diameter = C).  Plain min-label
    propagation needs O(C) full-table rounds here (the round-3 weakness);
    pointer jumping must finish in O(log C) rounds — enforced via the
    loop's iteration cap, which is ~4*log2(C) (components_iter_bound)."""
    import time

    import jax.numpy as jnp

    from hnswindex_tpu.core import graph as G
    from hnswindex_tpu.core import stats

    C = 8192
    cfg = G.GraphConfig(dim=8, metric="sq_euclid", max_edges=4,
                        max_levels=4, ef_construction=16,
                        search_iter_factor=4, build_expand=1,
                        rank_dtype="float32")
    state = G.empty_state(cfg, C)
    # chain 0 -> 1 -> ... -> C/2-1 plus a second chain over the top half
    half = C // 2
    nbr0 = np.full((C, state.nbr0.shape[1]), -1, np.int32)
    nbr0[: half - 1, 0] = np.arange(1, half)
    nbr0[half: C - 1, 0] = np.arange(half + 1, C)
    state = state._replace(
        nbr0=jnp.asarray(nbr0),
        deg0=jnp.asarray((nbr0[:, 0] >= 0).astype(np.int32)),
        active=jnp.ones((C,), bool),
        level=jnp.zeros((C,), jnp.int32),
        ep=jnp.asarray(0, jnp.int32),
        count=jnp.asarray(C, jnp.int32))
    bound = stats.components_iter_bound(C)
    t0 = time.perf_counter()
    cnt, nonempty = stats._components_at_layer(cfg, state, 0,
                                               max_iters=bound)
    assert bool(nonempty) and int(cnt) == 2, int(cnt)
    # re-run converged (compiled) for the honest wall check
    cnt, _ = stats._components_at_layer(cfg, state, 0, max_iters=bound)
    assert int(cnt) == 2
    assert time.perf_counter() - t0 < 120


def test_multi_layer_query(built):
    index, vecs, ids = built
    res = index.multi_layer_knn_query(vecs[7], k=5)
    assert len(res) >= 1
    for layer, entry in enumerate(res):
        assert entry is not None
        rid, rd = entry
        # reference drops the closest candidate per layer
        # (HNSWIndex.cs:184), so <= k-1 results
        assert rid.shape[0] <= 4
        assert np.all(np.diff(rd) >= 0)


def test_filtered_query(built):
    index, vecs, ids = built
    # allow only even ids via mask
    allowed = ids[ids % 2 == 0]
    rid, rd = index._impl.knn_query(vecs[:32], 5, filter_fnc=allowed)
    valid = rid[rid >= 0]
    assert valid.size > 0
    assert np.all(valid % 2 == 0)

    # callable filter over stored vectors (HNSWIndex.cs:111-113)
    rid2, _ = index._impl.knn_query(
        vecs[:8], 3, filter_fnc=lambda v: v[0] > 0.5)
    valid2 = rid2[rid2 >= 0]
    stored = index.items()
    stored_ids = index.ids()
    first = dict(zip(stored_ids.tolist(), stored[:, 0].tolist()))
    assert all(first[int(i)] > 0.5 for i in valid2)
