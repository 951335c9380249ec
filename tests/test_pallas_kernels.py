"""Pallas kernels in interpreter mode (CPU correctness; the compiled path
is exercised on TPU by bench.py / BlockIndex)."""

import numpy as np
import pytest

import jax.numpy as jnp

from hnswindex_tpu.ops.pallas_block import block_scores


@pytest.mark.parametrize("metric", ["sq_euclid", "cosine", "ucosine"])
def test_block_scores_interpret(metric):
    rng = np.random.default_rng(0)
    NB, BS, D, B, P = 16, 8, 32, 8, 4
    blk = rng.random((NB, BS, D)).astype(np.float32)
    if metric == "ucosine":
        blk /= np.linalg.norm(blk, axis=-1, keepdims=True)
    bids = rng.integers(0, NB, (B, P)).astype(np.int32)
    q = rng.random((B, D)).astype(np.float32)
    if metric == "ucosine":
        q /= np.linalg.norm(q, axis=-1, keepdims=True)

    got = np.asarray(block_scores(metric, jnp.asarray(blk),
                                  jnp.asarray(bids), jnp.asarray(q),
                                  interpret=True))
    g = blk[bids].reshape(B, P * BS, D).astype(np.float64)
    qq = q.astype(np.float64)[:, None, :]
    if metric == "sq_euclid":
        want = ((g - qq) ** 2).sum(-1)
    else:
        dot = (g * qq).sum(-1)
        if metric == "cosine":
            den = np.linalg.norm(g, axis=-1) * np.linalg.norm(qq, axis=-1)
            want = np.where(den > 0, 1 - dot / np.where(den > 0, den, 1), 1)
        else:
            want = 1 - dot
    assert np.allclose(got, want, atol=1e-4), np.abs(got - want).max()


def test_packed_rank_distance_identity():
    """The packed-residual rank distance ||q-u||^2 - 2(q-u)·r + ||r||^2
    equals the exact distance to the bf16-perturbed neighbor (core/pack.py
    docstring) — verifies the identity the serving engine ranks by."""
    rng = np.random.default_rng(1)
    D = 32
    u = rng.random(D).astype(np.float32)
    v = rng.random(D).astype(np.float32)
    q = rng.random(D).astype(np.float32)
    r16 = jnp.asarray(v - u, jnp.bfloat16)
    r = np.asarray(r16.astype(jnp.float32), dtype=np.float64)
    v_pert = u.astype(np.float64) + r
    du = ((q.astype(np.float64) - u) ** 2).sum()
    aux = (r * r).sum()
    rank_d = du - 2.0 * ((q.astype(np.float64) - u) * r).sum() + aux
    exact_d = ((q.astype(np.float64) - v_pert) ** 2).sum()
    assert abs(rank_d - exact_d) < 1e-9
    # and the perturbation is bounded by bf16 resolution of the residual
    assert np.abs(r - (v - u)).max() <= 2 ** -8 * np.abs(v - u).max()


@pytest.mark.parametrize("metric", ["sq_euclid", "cosine", "ucosine"])
def test_lane_min_scan_interpret(metric):
    """Fused streaming scan: lane s must hold the true min rank key among
    columns with col % BS == s, with inactive/excluded rows masked."""
    from hnswindex_tpu.ops import distance as dst
    from hnswindex_tpu.ops.fused_scan import lane_min_scan, rank_transform

    rng = np.random.default_rng(2)
    C, D, B, BS = 1024, 32, 8, 128
    vecs = rng.random((C, D)).astype(np.float32)
    if metric == "ucosine":
        vecs /= np.linalg.norm(vecs, axis=-1, keepdims=True)
    vecs[5] = 0.0  # zero-norm guard row
    q = rng.random((B, D)).astype(np.float32)
    active = rng.random(C) < 0.9
    excl = np.full(B, -1, np.int32)
    excl[0] = 17
    norms = np.asarray(dst.norm_data(metric, jnp.asarray(vecs)))

    mult, bias = rank_transform(metric, jnp.asarray(norms),
                                jnp.asarray(active))
    vals, ids = lane_min_scan(jnp.asarray(vecs), mult, bias,
                              jnp.asarray(q), jnp.asarray(excl),
                              BS=BS, interpret=True)
    vals, ids = np.asarray(vals), np.asarray(ids)

    # oracle keys in f64 from the same dot decomposition
    dots = q.astype(np.float64) @ vecs.astype(np.float64).T      # (B, C)
    key = dots * np.asarray(mult, np.float64)[None, :] \
        + np.asarray(bias, np.float64)[None, :]
    key[0, 17] = 3.0e38
    key = key.reshape(B, C // BS, BS)
    want_lane = key.min(axis=1)
    want_arg = key.argmin(axis=1) * BS + np.arange(BS)[None, :]

    live = want_lane < 1.0e37
    assert np.allclose(vals[live], want_lane[live], rtol=1e-4, atol=1e-4)
    # id agreement wherever the oracle min is unambiguous at f32 noise
    gap_ok = live  # random data: ties are measure-zero
    assert (ids[gap_ok] == want_arg[gap_ok]).mean() > 0.999
    assert (ids[~live] == -1).all()


def test_exact_knn2_fused_matches_panel_path():
    """exact_knn2's fused stage 1 must agree with the panel path on the
    returned top-k (same survivors semantics, exact f32 rescore)."""
    from hnswindex_tpu.ops import distance as dst
    from hnswindex_tpu.ops.bruteforce import exact_knn2

    rng = np.random.default_rng(3)
    C, D, B, k = 8192, 32, 16, 10
    vecs = rng.random((C, D)).astype(np.float32)
    active = np.ones(C, bool)
    active[::7] = False
    q = vecs[:B] + 0.01 * rng.standard_normal((B, D)).astype(np.float32)
    vj = jnp.asarray(vecs)
    nj = dst.norm_data("sq_euclid", vj)
    cj = vj.astype(jnp.bfloat16)

    import unittest.mock as um
    from hnswindex_tpu.ops import fused_scan as FS
    orig = FS.lane_min_scan

    def interp(coarse, mult, bias, qq, ex, BS=1024, interpret=False):
        return orig(coarse, mult, bias, qq, ex, BS=BS, interpret=True)

    with um.patch.object(FS, "lane_min_scan", interp):
        fd, fi = exact_knn2("sq_euclid", vj, cj, nj, jnp.asarray(active),
                            jnp.asarray(q), k, fused=True)
    pd_, pi = exact_knn2("sq_euclid", vj, cj, nj, jnp.asarray(active),
                         jnp.asarray(q), k, fused=False)
    fd, fi = np.asarray(fd), np.asarray(fi)
    pd_, pi = np.asarray(pd_), np.asarray(pi)
    # both paths are approximate at the survivor cut (bf16 coarse noise /
    # lane collisions), so gate on recall vs the f64 oracle, not equality
    d64 = ((q.astype(np.float64)[:, None, :]
            - vecs.astype(np.float64)[None, :, :]) ** 2).sum(-1)
    d64[:, ~active] = np.inf
    want = np.argsort(d64, axis=1)[:, :k]

    def recall(ids):
        return np.mean([len(set(a) & set(b)) / k
                        for a, b in zip(ids, want)])

    assert recall(fi) > 0.98, recall(fi)
    assert recall(pi) > 0.98, recall(pi)
    assert (fi == pi).mean() > 0.95, (fi != pi).sum()
    assert not np.isin(fi, np.flatnonzero(~active)).any()
    # rescored distances are exact f32 wherever ids agree
    same = fi == pi
    assert np.allclose(fd[same], pd_[same], rtol=1e-5, atol=1e-5)
