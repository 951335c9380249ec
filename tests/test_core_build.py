"""Core construction + search: wave-built graph must reach the reference's
own recall bar (GraphTests.cs:28-36 — self-recall@1 > 0.85 on random data).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from hnswindex_tpu.core import graph as G
from hnswindex_tpu.core.construct import insert_wave
from hnswindex_tpu.core.search import knn_search


def build(cfg, vectors, params_rate, seed=65537, max_wave=128):
    n = vectors.shape[0]
    rng = np.random.default_rng(seed)
    lvls = G.sample_levels(rng, n, params_rate, cfg.max_levels)
    state = G.empty_state(cfg, capacity=int(2 ** np.ceil(np.log2(n))))
    state = G.seed_first_node(cfg, state, 0, vectors[0], int(lvls[0]))
    i = 1
    wave = 1
    while i < n:
        w = min(wave, max_wave, n - i)
        ids = jnp.asarray(np.arange(i, i + w), jnp.int32)
        state = insert_wave(cfg, state, ids,
                            jnp.asarray(vectors[i:i + w]),
                            jnp.asarray(lvls[i:i + w]),
                            jnp.ones(w, bool))
        i += w
        wave *= 2
    return state


@pytest.mark.parametrize("metric", ["sq_euclid", "ucosine"])
def test_self_recall(metric):
    rng = np.random.default_rng(65537)
    n, dim = 1500, 32
    vecs = rng.random((n, dim), dtype=np.float32)
    if metric == "ucosine":
        vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    cfg = G.GraphConfig(dim=dim, metric=metric, max_edges=16,
                        max_levels=5, ef_construction=100)
    state = build(cfg, vecs, params_rate=1 / np.log(16))

    ef = 5  # max(MinNN=5, k=1) — HNSWIndex.cs:115
    dists, ids = knn_search(cfg, state, jnp.asarray(vecs), 0, ef,
                            8 * ef + 16)
    top1 = np.asarray(ids)[:, 0]
    recall = float(np.mean(top1 == np.arange(n)))
    assert recall > 0.85, recall


def test_degree_caps_and_padding_invariant():
    rng = np.random.default_rng(7)
    n, dim, M = 600, 16, 8
    vecs = rng.random((n, dim), dtype=np.float32)
    cfg = G.GraphConfig(dim=dim, metric="sq_euclid", max_edges=M,
                        max_levels=5, ef_construction=50)
    state = build(cfg, vecs, params_rate=1 / np.log(M))

    nbr, deg = G.dense_tables(state)
    lvl = np.asarray(state.level)
    L = nbr.shape[0]
    for l in range(L):
        cap = 2 * M if l == 0 else M
        on_layer = (lvl >= l) & (lvl >= 0)
        assert deg[l][on_layer].max(initial=0) <= cap, (l, deg[l].max())
        assert np.all(deg[l][~on_layer] == 0)
        # slots >= deg are -1, slots < deg are valid ids of layer members
        for u in np.nonzero(on_layer)[0][:50]:
            row = nbr[l, u]
            d = deg[l, u]
            assert np.all(row[d:] == -1)
            assert np.all(row[:d] >= 0)
            # neighbors must themselves live on this layer
            assert np.all(lvl[row[:d]] >= l)
            # no self loops, no duplicates
            assert u not in row[:d]
            assert len(set(row[:d].tolist())) == d


@pytest.mark.parametrize("path", ["exact", "beam"])
def test_facade_build_row_invariants(path):
    """Every row of a facade-built graph (both candidate paths) is
    dup-free, self-loop-free, -1-padded — the invariant the reference's
    EdgeList selection logic guarantees implicitly."""
    from hnswindex_tpu import HNSWIndex, HNSWParameters

    rng = np.random.default_rng(3)
    n, dim = 400, 24
    vecs = rng.random((n, dim), dtype=np.float32)
    p = HNSWParameters(collection_size=n, max_edges=8, max_candidates=40)
    if path == "beam":
        p.exact_build_threshold = 0
    idx = HNSWIndex(dim, parameters=p)
    idx.add(vecs)

    from hnswindex_tpu.core import graph as G2
    nbr, deg = G2.dense_tables(idx._state)
    lvl = np.asarray(idx._state.level)
    for l in range(nbr.shape[0]):
        # layer 0 may transiently exceed the 2M cap by reverse_slack
        # columns between overflow re-prunes (params.reverse_slack)
        cap = 2 * 8 + idx.params.reverse_slack if l == 0 else 8
        for u in np.nonzero(lvl >= l)[0]:
            d = deg[l, u]
            row = nbr[l, u]
            assert d <= cap
            assert np.all(row[d:] == -1)
            assert np.all(row[:d] >= 0)
            assert u not in row[:d]
            assert len(set(row[:d].tolist())) == d, (l, u, row[:d])


def test_entry_point_is_max_level():
    rng = np.random.default_rng(11)
    n, dim = 300, 8
    vecs = rng.random((n, dim), dtype=np.float32)
    cfg = G.GraphConfig(dim=dim, max_edges=8, max_levels=6,
                        ef_construction=30)
    state = build(cfg, vecs, params_rate=1 / np.log(8))
    lvl = np.asarray(state.level)
    ep = int(state.ep)
    assert lvl[ep] == lvl.max()


def test_scan2_steady_wave_equivalence(monkeypatch):
    """Full-width steady waves routed through the two-stage candidate
    scan (construct.base_connect_exact scan2=True -> exact_knn2) build a
    graph equivalent to the blocked exact_knn path: same invariants,
    recall within noise.  Production turns scan2 on from 1M rows
    (construct.BUILD_SCAN2_MIN); the threshold is patched down so the
    CPU suite covers the branch (exact_knn2 takes its panel fallback
    here — the fused Pallas form needs the TPU backend)."""
    from hnswindex_tpu import HNSWIndex, HNSWParameters
    from hnswindex_tpu.core import construct as CT
    from hnswindex_tpu.core import graph as G2

    rng = np.random.default_rng(7)
    n, dim = 1536, 16
    vecs = rng.random((n, dim), dtype=np.float32)

    def build_idx():
        p = HNSWParameters(collection_size=n, max_edges=8,
                           max_candidates=40, random_seed=31337)
        idx = HNSWIndex(dim, parameters=p)
        idx.add(vecs)
        return idx

    base = build_idx()
    monkeypatch.setattr(CT, "BUILD_SCAN2_MIN", 256)
    two = build_idx()

    def recall(idx):
        qi, _ = idx.knn_query(vecs[:256], k=1)
        return float((qi[:, 0] == np.arange(256)).mean())

    r_base, r_two = recall(base), recall(two)
    assert r_two >= r_base - 0.03, (r_base, r_two)

    nbr, deg = G2.dense_tables(two._state)
    lvl = np.asarray(two._state.level)
    for l in range(nbr.shape[0]):
        cap = 2 * 8 + two.params.reverse_slack if l == 0 else 8
        for u in np.nonzero(lvl >= l)[0]:
            d = deg[l, u]
            row = nbr[l, u]
            assert d <= cap
            assert np.all(row[d:] == -1)
            assert u not in row[:d]
            assert len(set(row[:d].tolist())) == d

