"""Pallas kernels in interpreter mode (CPU correctness; the compiled path
is exercised on TPU by bench.py / BlockIndex)."""

import numpy as np
import pytest

import jax.numpy as jnp

from hnswindex_tpu.ops.pallas_block import block_scores
from hnswindex_tpu.ops.pallas_gather import gather_distances


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


def test_gather_distances_interpret():
    rng = np.random.default_rng(1)
    C, D, B, K = 64, 16, 16, 8
    vecs = rng.random((C, D)).astype(np.float32)
    ids = rng.integers(0, C, (B, K)).astype(np.int32)
    q = rng.random((B, D)).astype(np.float32)
    got = np.asarray(gather_distances("sq_euclid", jnp.asarray(vecs),
                                      jnp.asarray(ids), jnp.asarray(q),
                                      interpret=True))
    want = ((vecs[ids].astype(np.float64)
             - q.astype(np.float64)[:, None, :]) ** 2).sum(-1)
    assert np.allclose(got, want, atol=1e-4)
