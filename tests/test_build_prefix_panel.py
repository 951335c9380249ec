"""Exact-build scan-prefix bounding + upper-node panel lifecycle.

The exact build path scans only the bucketed high-water slot prefix
(index.SCAN_FLOOR buckets) and connects upper layers from a compacted
panel of live level>=1 nodes.  At production scale the prefix activates
past 1M capacity, which the rest of the suite never reaches — these tests
shrink the floor to exercise the prefix arithmetic and the panel's
append / remove / compact / lazy-rebuild transitions at test scale.
"""

import numpy as np
import pytest

import hnswindex_tpu.index as IX
from hnswindex_tpu import HNSWIndex, HNSWParameters


@pytest.fixture
def tiny_scan_floor(monkeypatch):
    monkeypatch.setattr(IX, "SCAN_FLOOR", 32)
    monkeypatch.setattr(IX, "_PANEL_MIN_CAP", 8)


def _self_recall(idx, vecs, ids):
    r, _ = idx.knn_query(vecs, k=1)
    return float(np.mean(r[:, 0] == ids))


def test_prefix_scan_matches_full_scan(tiny_scan_floor):
    """A build whose scans are prefix-bounded must equal quality-wise a
    build that always scans full capacity (same seeds -> same levels)."""
    rng = np.random.default_rng(65537)
    n, dim = 500, 32
    vecs = rng.random((n, dim), dtype=np.float32)

    p = HNSWParameters(collection_size=1024, max_wave_size=64)
    idx = HNSWIndex(dim, parameters=p)
    ids = idx.add(vecs)
    # high-water mark tracks the max activated slot
    assert idx._scan_hwm == int(ids.max()) + 1
    rec = _self_recall(idx, vecs, ids)
    assert rec > 0.85, rec

    # unpatched (full-capacity scans) reference build, same seed
    IX.SCAN_FLOOR = 1 << 20
    try:
        idx2 = HNSWIndex(dim, parameters=HNSWParameters(
            collection_size=1024, max_wave_size=64))
        ids2 = idx2.add(vecs)
    finally:
        IX.SCAN_FLOOR = 32
    r1, d1 = idx.knn_query(vecs[:100], k=5)
    r2, d2 = idx2.knn_query(vecs[:100], k=5)
    # same level seeds + exact candidates either way -> identical graphs
    assert np.array_equal(ids, ids2)
    assert np.array_equal(r1, r2)


def test_panel_tracks_upper_nodes_through_mutation(tiny_scan_floor):
    rng = np.random.default_rng(3)
    n, dim = 400, 16
    vecs = rng.random((n, dim), dtype=np.float32)
    p = HNSWParameters(collection_size=512, max_wave_size=64)
    idx = HNSWIndex(dim, parameters=p)
    ids = idx.add(vecs)

    lvl = np.asarray(idx._state.level)
    act = np.asarray(idx._state.active)
    want = set(np.flatnonzero(act & (lvl >= 1)).tolist())
    assert set(idx._upper_pos.keys()) == want
    panel = np.asarray(idx._upper_ids)
    assert set(panel[panel >= 0].tolist()) == want

    # remove a mix of upper and base nodes; panel must drop the uppers
    upper_ids = np.asarray(sorted(want), np.int32)
    base_ids = np.asarray(sorted(set(ids.tolist()) - want), np.int32)
    drop = np.concatenate([upper_ids[: len(upper_ids) // 2], base_ids[:50]])
    idx.remove(drop)
    survivors = want - set(drop.tolist())
    assert set(idx._upper_pos.keys()) == survivors
    panel = np.asarray(idx._upper_ids)
    assert set(panel[panel >= 0].tolist()) == survivors

    # re-add: freed slots recycle; panel gains exactly the new uppers
    more = rng.random((80, dim), dtype=np.float32)
    mids = idx.add(more)
    lvl = np.asarray(idx._state.level)
    act = np.asarray(idx._state.active)
    want2 = set(np.flatnonzero(act & (lvl >= 1)).tolist())
    assert set(idx._upper_pos.keys()) == want2
    panel = np.asarray(idx._upper_ids)
    assert set(panel[panel >= 0].tolist()) == want2

    keep = np.asarray(sorted(set(ids.tolist()) - set(drop.tolist())),
                      np.int32)
    kv = vecs[keep]  # ids == insertion order here (fresh index, no frees)
    rec = _self_recall(idx, kv, keep)
    assert rec > 0.85, rec


def test_panel_compaction_under_churn(tiny_scan_floor):
    """Many remove/add rounds force hole compaction (threshold 1024 is
    patched implicitly by _PANEL_MIN_CAP=8 keeping the panel tiny)."""
    rng = np.random.default_rng(11)
    dim = 16
    p = HNSWParameters(collection_size=256, max_wave_size=32)
    idx = HNSWIndex(dim, parameters=p)
    vecs = rng.random((120, dim), dtype=np.float32)
    idx.add(vecs)
    for round_ in range(6):
        live = idx.ids()
        drop = rng.choice(live, size=40, replace=False).astype(np.int32)
        idx.remove(drop)
        idx.add(rng.random((40, dim), dtype=np.float32))
        lvlj = idx._state.level
        actj = np.asarray(idx._state.active)
        lvl = np.asarray(lvlj)
        want = set(np.flatnonzero(actj & (lvl >= 1)).tolist())
        assert set(idx._upper_pos.keys()) == want, round_
    assert idx.count == 120


def test_panel_lazy_rebuild_after_deserialize(tiny_scan_floor, tmp_path):
    rng = np.random.default_rng(5)
    n, dim = 300, 16
    vecs = rng.random((n, dim), dtype=np.float32)
    p = HNSWParameters(collection_size=512, max_wave_size=64)
    idx = HNSWIndex(dim, parameters=p)
    ids = idx.add(vecs)
    path = str(tmp_path / "snap.npz")
    idx.serialize(path)

    idx2 = HNSWIndex.deserialize(path)
    assert idx2._upper_cnt == -1  # lazy marker
    # adds after load trigger the rebuild; membership must be exact
    more = rng.random((60, dim), dtype=np.float32)
    idx2.add(more)
    lvl = np.asarray(idx2._state.level)
    act = np.asarray(idx2._state.active)
    want = set(np.flatnonzero(act & (lvl >= 1)).tolist())
    assert set(idx2._upper_pos.keys()) == want
    rec = _self_recall(idx2, vecs, ids)
    assert rec > 0.85, rec
