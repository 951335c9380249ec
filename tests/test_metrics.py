"""Distance-kernel numeric-oracle tests.

Mirrors the reference's MetricsTests.cs:7-92: every metric is checked
against a NumPy float64 oracle at an aligned dim (128) and an unaligned dim
(127, the SIMD tail path in the reference), tolerance 1e-6 relative to the
oracle — plus the matmul-decomposed batch path used by the search kernels.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from hnswindex_tpu.ops import distance as dst


def oracle(metric, a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    if metric == "sq_euclid":
        d = a - b
        return np.sum(d * d, -1)
    dot = np.sum(a * b, -1)
    if metric == "cosine":
        na = np.linalg.norm(a, axis=-1)
        nb = np.linalg.norm(b, axis=-1)
        denom = na * nb
        return np.where(denom > 0, 1.0 - dot / np.where(denom > 0, denom, 1),
                        1.0)
    return 1.0 - dot


@pytest.mark.parametrize("metric", dst.VALID_METRICS)
@pytest.mark.parametrize("dim", [127, 128])
def test_exact_matches_oracle(metric, dim):
    rng = np.random.default_rng(65537)
    a = rng.random((64, dim), dtype=np.float32)
    b = rng.random((64, dim), dtype=np.float32)
    if metric == "ucosine":
        a /= np.linalg.norm(a, axis=1, keepdims=True)
        b /= np.linalg.norm(b, axis=1, keepdims=True)
    got = np.asarray(dst.exact(metric, jnp.asarray(a), jnp.asarray(b)))
    want = oracle(metric, a, b)
    assert np.allclose(got, want, atol=2e-5), np.abs(got - want).max()


@pytest.mark.parametrize("metric", dst.VALID_METRICS)
@pytest.mark.parametrize("dim", [127, 128])
def test_pairwise_matches_oracle(metric, dim):
    rng = np.random.default_rng(31337)
    q = rng.random((8, dim), dtype=np.float32)
    x = rng.random((32, dim), dtype=np.float32)
    if metric == "ucosine":
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        x /= np.linalg.norm(x, axis=1, keepdims=True)
    got = np.asarray(dst.pairwise(metric, jnp.asarray(q), jnp.asarray(x)))
    want = oracle(metric, q[:, None, :], x[None, :, :])
    # matmul decomposition loses a few bits to cancellation vs the oracle
    assert np.allclose(got, want, atol=1e-3), np.abs(got - want).max()


def test_cosine_zero_norm_guard():
    # CosineMetric.cs:88-91 — zero vector => distance exactly 1.
    a = jnp.zeros((1, 8), jnp.float32)
    b = jnp.ones((1, 8), jnp.float32)
    assert float(dst.exact("cosine", a, b)[0]) == 1.0
    assert float(dst.pairwise("cosine", a, b)[0, 0]) == 1.0


def test_from_dot_consistency():
    rng = np.random.default_rng(7)
    q = jnp.asarray(rng.random((4, 64), dtype=np.float32))
    x = jnp.asarray(rng.random((4, 64), dtype=np.float32))
    for metric in dst.VALID_METRICS:
        qn = dst.norm_data(metric, q)
        xn = dst.norm_data(metric, x)
        dot = jnp.sum(q * x, -1)
        got = dst.from_dot(metric, dot, qn, xn)
        want = dst.exact(metric, q, x)
        assert np.allclose(np.asarray(got), np.asarray(want), atol=1e-4)
