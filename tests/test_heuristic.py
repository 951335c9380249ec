"""Batched relative-neighbor pruning vs a NumPy port of the reference
algorithm (Heuristic.cs:11-46)."""

import numpy as np

import jax.numpy as jnp

from hnswindex_tpu.core import heuristic
from hnswindex_tpu.ops import distance as dst


def reference_prune(cand_ids, cand_d, vecs_by_id, max_edges, metric):
    """Direct port of RelativeNeighborPruning semantics for testing."""
    cand = [(i, d) for i, d in zip(cand_ids, cand_d) if i >= 0]
    if len(cand) < max_edges:
        # keep-all branch (Heuristic.cs:13-18) — but our kernel reports them
        # in ascending-distance order, so sort here too for comparison.
        return sorted((i for i, _ in cand),
                      key=lambda i: dict(cand)[i])
    cand.sort(key=lambda t: t[1])
    result = []
    for cid, cdist in cand:
        if len(result) >= max_edges:
            break
        ok = True
        for sid in result:
            d = float(np.asarray(dst.exact(
                metric, vecs_by_id[sid], vecs_by_id[cid])))
            if d < cdist:
                ok = False
                break
        if ok:
            result.append(cid)
    return result


def test_prune_matches_reference_semantics():
    rng = np.random.default_rng(123)
    dim, n_cand, max_edges = 16, 24, 8
    B = 12
    vecs = rng.random((64, dim)).astype(np.float32)
    metric = "sq_euclid"

    cand_ids = np.stack([rng.choice(64, n_cand, replace=False)
                         for _ in range(B)]).astype(np.int32)
    # knock some out as invalid
    cand_ids[:, -3:] = -1
    targets = rng.random((B, dim)).astype(np.float32)
    cand_d = np.stack([
        np.asarray(dst.exact(metric, targets[b], vecs[np.clip(cand_ids[b], 0, None)]))
        for b in range(B)]).astype(np.float32)

    cvecs = vecs[np.clip(cand_ids, 0, None)]
    cnorms = np.asarray(dst.norm_data(metric, jnp.asarray(cvecs)))
    sel, cnt = heuristic.prune(metric, jnp.asarray(cand_ids),
                               jnp.asarray(cand_d), jnp.asarray(cvecs),
                               jnp.asarray(cnorms), max_edges)
    sel = np.asarray(sel)
    cnt = np.asarray(cnt)

    for b in range(B):
        want = reference_prune(cand_ids[b], cand_d[b],
                               {i: vecs[i] for i in cand_ids[b] if i >= 0},
                               max_edges, metric)
        got = [i for i in sel[b] if i >= 0]
        assert got == want, (b, got, want)
        assert cnt[b] == len(want)


def test_prune_keep_all_when_few():
    # fewer candidates than max_edges -> all kept (Heuristic.cs:13-18)
    metric = "sq_euclid"
    ids = jnp.asarray([[3, 7, -1, -1]], jnp.int32)
    d = jnp.asarray([[2.0, 1.0, 0.0, 0.0]], jnp.float32)
    vecs = jnp.zeros((1, 4, 8), jnp.float32)
    norms = jnp.zeros((1, 4), jnp.float32)
    sel, cnt = heuristic.prune(metric, ids, d, vecs, norms, 8)
    assert int(cnt[0]) == 2
    assert set(np.asarray(sel[0][:2]).tolist()) == {3, 7}
    # ascending distance order
    assert np.asarray(sel[0][:2]).tolist() == [7, 3]


def test_prune_force_mask():
    metric = "sq_euclid"
    ids = jnp.asarray([[1, 2], [3, 4]], jnp.int32)
    d = jnp.ones((2, 2), jnp.float32)
    vecs = jnp.zeros((2, 2, 4), jnp.float32)
    norms = jnp.zeros((2, 2), jnp.float32)
    sel, cnt = heuristic.prune(metric, ids, d, vecs, norms, 4,
                               force_mask=jnp.asarray([True, False]))
    assert int(cnt[0]) == 2
    assert int(cnt[1]) == 0
    assert np.all(np.asarray(sel[1]) == -1)


def test_accept_impls_agree():
    """The scan and unroll accept-loop implementations must compute the
    identical sequential accept set on arbitrary conflict tensors."""
    import numpy as np
    import jax.numpy as jnp

    from hnswindex_tpu.core import heuristic as H

    rng = np.random.default_rng(123)
    for B, N, p in [(7, 37, 0.1), (16, 64, 0.3), (3, 100, 0.05),
                    (5, 8, 0.5), (4, 3, 0.4)]:
        conf = rng.random((B, N, N)) < p
        tri = np.triu(np.ones((N, N), bool), k=1)
        conf = jnp.asarray(conf & tri[None])
        a = np.asarray(H._accept_scan(conf))
        b = np.asarray(H._accept_unroll(conf))
        assert np.array_equal(a, b), (B, N, p)


def test_accept_unroll_full_pipeline():
    """prune() under ACCEPT_MODE='unroll' returns the same selections as
    the default scan mode."""
    import numpy as np
    import jax.numpy as jnp

    from hnswindex_tpu.core import heuristic as H

    rng = np.random.default_rng(7)
    B, N, D = 6, 50, 16
    vecs = rng.random((B, N, D)).astype(np.float32)
    tgt = rng.random((B, D)).astype(np.float32)
    d = ((vecs - tgt[:, None]) ** 2).sum(-1).astype(np.float32)
    ids = rng.permutation(B * N).reshape(B, N).astype(np.int32)
    norms = (vecs ** 2).sum(-1).astype(np.float32)
    args = ("sq_euclid", jnp.asarray(ids), jnp.asarray(d),
            jnp.asarray(vecs), jnp.asarray(norms), 8)
    sel_a, cnt_a = H.prune(*args)
    old = H.ACCEPT_MODE
    try:
        H.ACCEPT_MODE = "unroll"
        sel_b, cnt_b = H.prune(*args)
    finally:
        H.ACCEPT_MODE = old
    assert np.array_equal(np.asarray(sel_a), np.asarray(sel_b))
    assert np.array_equal(np.asarray(cnt_a), np.asarray(cnt_b))
