"""Multi-slab double-buffered insert path (round 5): slab j+1 streams
while slab j's waves run; the built graph must be bit-identical to a
single-slab build.  Lives in its own file: the three facade builds here
push a shared process over the XLA-CPU compiler's segfault threshold
(CLAUDE.md) when combined with test_core_build's compiles."""

import numpy as np

def test_multi_slab_double_buffered_build(monkeypatch):
    """A batch spanning multiple upload slabs (slab j+1 streams while
    slab j's waves run — round-5 double buffering) builds the identical
    graph to a single-slab build: same seeded levels, same wave
    schedule, bit-identical tables."""
    from hnswindex_tpu import HNSWIndex, HNSWParameters

    rng = np.random.default_rng(77)
    n, dim = 700, 16
    vecs = rng.random((n, dim), dtype=np.float32)
    p = HNSWParameters(collection_size=n, max_edges=8, max_candidates=40,
                       max_wave_size=64, random_seed=5)

    ref = HNSWIndex(dim, parameters=p)
    ref.add(vecs)                      # single slab (floor 512 > 700? no:
    #                                    700 > 512 -> already 2 slabs; pin
    #                                    a huge floor to force ONE slab)
    monkeypatch.setattr(HNSWIndex, "_SLAB_MIN", 1 << 20)
    one = HNSWIndex(dim, parameters=p)
    one.add(vecs)
    monkeypatch.setattr(HNSWIndex, "_SLAB_MIN", 96)  # many tiny slabs
    many = HNSWIndex(dim, parameters=p)
    many.add(vecs)

    for a, b in ((ref, one), (ref, many)):
        assert np.array_equal(np.asarray(a._state.nbr0),
                              np.asarray(b._state.nbr0))
        assert np.array_equal(np.asarray(a._state.nbru),
                              np.asarray(b._state.nbru))
        assert np.array_equal(np.asarray(a._state.level),
                              np.asarray(b._state.level))
        assert int(a._state.ep) == int(b._state.ep)

    qi, _ = many.knn_query(vecs, 1)
    assert (qi[:, 0] == np.arange(n)).mean() > 0.85

