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
