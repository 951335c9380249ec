"""Packed-neighborhood serving (core/pack.py): recall parity with the
unpacked beam, filter semantics, cache invalidation, and auto gating."""

import numpy as np
import pytest

from hnswindex_tpu import HNSWIndex, HNSWParameters

DIM = 32
N = 1200


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(4242)
    return rng.random((N, DIM), dtype=np.float32)


def _build(vecs, metric="sq_euclid", **kw):
    p = HNSWParameters(collection_size=N + 64, pack_queries="on", **kw)
    ix = HNSWIndex(DIM, metric, parameters=p)
    ids = ix.add(vecs)
    return ix, ids


@pytest.mark.parametrize("metric", ["sq_euclid", "cosine", "ucosine"])
def test_packed_recall(corpus, metric):
    vecs = corpus
    if metric == "ucosine":
        vecs = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    ix, ids = _build(vecs, metric)
    qi, qd = ix.knn_query(vecs, k=1)
    assert ix._pack is not None
    rec = float((qi[:, 0] == ids).mean())
    assert rec > 0.9, rec
    # returned distances are refined: self-distance ~ 0
    assert np.nanmax(qd[:, 0]) < 1e-4


def test_packed_matches_unpacked(corpus):
    ix, ids = _build(corpus)
    qp_i, _ = ix.knn_query(corpus[:256], k=5)
    ix.params.pack_queries = "off"
    up_i, _ = ix.knn_query(corpus[:256], k=5)
    # same graph, both searches clear the bar; top-1 overlap is high
    agree = float((qp_i[:, 0] == up_i[:, 0]).mean())
    assert agree > 0.9, agree


def test_packed_filter_semantics(corpus):
    ix, ids = _build(corpus)
    allowed = ids[: N // 3]
    fi, fd = ix.knn_query(corpus[:64], k=5, filter_fnc=allowed)
    assert ix._pack is not None
    got = fi[fi >= 0]
    assert got.size > 0
    assert np.isin(got, allowed).all()
    # callable predicate over the stored vector (HNSWIndex.cs:111-113)
    fi2, _ = ix.knn_query(corpus[:8], k=3,
                          filter_fnc=lambda v: v[0] > 0.5)
    vec0 = ix._host_vecs()[fi2[fi2 >= 0]]
    assert (vec0[:, 0] > 0.5).all()


def test_pack_invalidation_on_mutation(corpus):
    ix, ids = _build(corpus)
    ix.knn_query(corpus[:4], k=1)
    assert ix._pack is not None
    rng = np.random.default_rng(7)
    extra = rng.random((16, DIM), dtype=np.float32) + 3.0
    eids = ix.add(extra)
    assert ix._pack is None            # dropped on add
    ri, _ = ix.knn_query(extra, k=1)
    assert (ri[:, 0] == eids).mean() > 0.9
    ix.remove(ids[:20])
    assert ix._pack is None            # dropped on remove
    ki, _ = ix.knn_query(corpus[:20], k=3)
    assert not np.isin(ki, ids[:20]).any()


def test_pack_auto_gating():
    rng = np.random.default_rng(3)
    vecs = rng.random((500, DIM), dtype=np.float32)
    p = HNSWParameters(collection_size=512, pack_queries="auto")
    ix = HNSWIndex(DIM, parameters=p)
    ix.add(vecs)
    ix.knn_query(vecs[:4], k=1)
    assert ix._pack is None            # below pack_min_count
    p2 = HNSWParameters(collection_size=512, pack_queries="auto",
                        pack_min_count=100)
    ix2 = HNSWIndex(DIM, parameters=p2)
    ix2.add(vecs)
    ix2.knn_query(vecs[:4], k=1)
    assert ix2._pack is not None


def test_pack_budget_gating(corpus):
    p = HNSWParameters(collection_size=N, pack_queries="on",
                       pack_max_bytes=1024)
    ix = HNSWIndex(DIM, parameters=p)
    ids = ix.add(corpus)
    qi, _ = ix.knn_query(corpus[:32], k=1)
    assert ix._pack is None            # over budget -> unpacked serve
    assert (qi[:, 0] == ids[:32]).mean() > 0.85


def test_pack_dtype_selection():
    """params.pack_dtype: bf16 default, f32 opt-in, auto = widest fit;
    f32 packs rank at full precision with identical result contracts."""
    import jax.numpy as jnp

    from hnswindex_tpu import HNSWIndex, HNSWParameters
    from hnswindex_tpu.core import pack as PK
    from hnswindex_tpu.index import resolve_pack_dtype

    rng = np.random.default_rng(8)
    n, dim = 600, 16
    vecs = rng.random((n, dim), dtype=np.float32)

    def build(**kw):
        p = HNSWParameters(collection_size=n, max_wave_size=64,
                           pack_queries="on", random_seed=4, **kw)
        ix = HNSWIndex(dim, parameters=p)
        ix.add(vecs)
        pk = ix._get_pack()
        return ix, pk

    ix_b, pk_b = build()
    assert pk_b is not None and pk_b.res.dtype == jnp.bfloat16
    ix_f, pk_f = build(pack_dtype="f32")
    assert pk_f is not None and pk_f.res.dtype == jnp.float32
    ix_a, pk_a = build(pack_dtype="auto")
    assert pk_a.res.dtype == jnp.float32   # tiny corpus: f32 fits

    # f32 residuals are exact: packed results == unpacked beam results
    bi, bd = ix_f.knn_query(vecs[:64], k=5)
    ui, ud = ix_b.knn_query(vecs[:64], k=5)
    # both clear self-recall regardless of residual dtype
    assert (bi[:, 0] == np.arange(64)).mean() > 0.9
    assert (ui[:, 0] == np.arange(64)).mean() > 0.9

    # auto degrades to bf16, then to no pack, as the budget shrinks
    C = ix_b._state.capacity
    K = ix_b._state.nbr0.shape[1]
    f32_bytes = PK.pack_bytes(C, K, dim, jnp.float32)
    bf16_bytes = PK.pack_bytes(C, K, dim, jnp.bfloat16)
    p = HNSWParameters(pack_dtype="auto", pack_max_bytes=f32_bytes - 1)
    assert resolve_pack_dtype(p, C, K, dim) == jnp.bfloat16
    p = HNSWParameters(pack_dtype="auto", pack_max_bytes=bf16_bytes - 1)
    assert resolve_pack_dtype(p, C, K, dim) is None
    with pytest.raises(ValueError):
        HNSWParameters(pack_dtype="f64").validate()
