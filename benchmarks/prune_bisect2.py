"""Bisect heuristic.prune cost at construction batch sizes on TPU.

Times cumulative prefixes of the prune pipeline at B=16384, N=40
(the layer-0 reverse-edge overflow re-prune shape at W=512, K=32, A=8).
Each stage is timed as R chained dispatches + one sync (the relay's
block_until_ready is async-fake; a dependent scalar readback is the fence).
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

sys.path.insert(0, "/root/repo")
from hnswindex_tpu.ops import distance as dst  # noqa: E402

B, N, D = 16384, 40, 128
C = 1 << 23
R = 10
metric = "sq_euclid"

key = jax.random.PRNGKey(0)
vecs = jax.random.normal(key, (C, D), jnp.float32)
norms = dst.norm_data(metric, vecs)
tids = jax.random.randint(jax.random.PRNGKey(1), (B,), 0, C)
cids = jax.random.randint(jax.random.PRNGKey(2), (B, N), 0, C)
cids = jnp.where(jax.random.uniform(jax.random.PRNGKey(3), (B, N)) < 0.9,
                 cids, -1)
mask = jnp.ones((B,), bool)
np.asarray(jnp.sum(norms))


def timeit(name, fn, *args):
    f = jax.jit(fn)
    out = f(jnp.float32(0.0), vecs, norms, *args)
    np.asarray(out)  # compile+warm
    t0 = time.perf_counter()
    acc = jnp.float32(0.0)
    for _ in range(R):
        acc = f(acc, vecs, norms, *args)
    np.asarray(acc)
    dt = (time.perf_counter() - t0) / R * 1000
    print(f"{name}: {dt:.1f} ms", file=sys.stderr, flush=True)
    return dt


def stage_gather(eps, vecs, norms, tids, cids):
    tcc = jnp.clip(tids + (eps * 0).astype(jnp.int32), 0, C - 1)
    ccc = jnp.clip(cids, 0, C - 1)
    tvec = vecs[tcc]
    cvecs = vecs[ccc]
    return jnp.sum(tvec[:, 0]) + jnp.sum(cvecs[:, 0, 0])


def stage_cd(eps, vecs, norms, tids, cids):
    tcc = jnp.clip(tids + (eps * 0).astype(jnp.int32), 0, C - 1)
    ccc = jnp.clip(cids, 0, C - 1)
    tvec, tn = vecs[tcc], norms[tcc]
    cvecs, cn = vecs[ccc], norms[ccc]
    cd = dst.gathered(metric, tvec, tn, cvecs, cn)
    return jnp.sum(cd)


def stage_pair(eps, vecs, norms, tids, cids):
    ccc = jnp.clip(cids + (eps * 0).astype(jnp.int32), 0, C - 1)
    cvecs, cn = vecs[ccc], norms[ccc]
    dots = jnp.einsum("bid,bjd->bij", cvecs, cvecs,
                      precision=dst.DOT_PRECISION,
                      preferred_element_type=jnp.float32)
    pd = dst.from_dot(metric, dots, cn[:, :, None], cn[:, None, :])
    return jnp.sum(pd)


def stage_pair_bf16(eps, vecs, norms, tids, cids):
    ccc = jnp.clip(cids + (eps * 0).astype(jnp.int32), 0, C - 1)
    cvecs, cn = vecs[ccc].astype(jnp.bfloat16), norms[ccc]
    dots = jnp.einsum("bid,bjd->bij", cvecs, cvecs,
                      preferred_element_type=jnp.float32)
    pd = dst.from_dot(metric, dots, cn[:, :, None], cn[:, None, :])
    return jnp.sum(pd)


def stage_sortperm(eps, vecs, norms, tids, cids):
    """argsort + one-hot permute of the conflict tensor."""
    ccc = jnp.clip(cids + (eps * 0).astype(jnp.int32), 0, C - 1)
    tcc = jnp.clip(tids, 0, C - 1)
    tvec, tn = vecs[tcc], norms[tcc]
    cvecs, cn = vecs[ccc], norms[ccc]
    cd = dst.gathered(metric, tvec, tn, cvecs, cn)
    valid = cids >= 0
    d = jnp.where(valid, cd, jnp.inf)
    order = jnp.argsort(d, axis=1, stable=True)
    dots = jnp.einsum("bid,bjd->bij", cvecs, cvecs,
                      precision=dst.DOT_PRECISION,
                      preferred_element_type=jnp.float32)
    pd = dst.from_dot(metric, dots, cn[:, :, None], cn[:, None, :])
    conflict_u = (pd < d[:, None, :]) & valid[:, :, None] & valid[:, None, :]
    onehot = (order[:, :, None] == jnp.arange(N)[None, None, :]
              ).astype(jnp.bfloat16)
    cu16 = conflict_u.astype(jnp.bfloat16)
    cs = jnp.einsum("pia,pab->pib", onehot, cu16,
                    preferred_element_type=jnp.float32)
    cs = jnp.einsum("pib,pjb->pij", cs.astype(jnp.bfloat16), onehot,
                    preferred_element_type=jnp.float32)
    return jnp.sum(cs)


def stage_full(eps, vecs, norms, tids, cids):
    from hnswindex_tpu.core import heuristic
    ccc = jnp.clip(cids + (eps * 0).astype(jnp.int32), 0, C - 1)
    tcc = jnp.clip(tids, 0, C - 1)
    tvec, tn = vecs[tcc], norms[tcc]
    cvecs, cn = vecs[ccc], norms[ccc]
    cd = dst.gathered(metric, tvec, tn, cvecs, cn)
    cd = jnp.where(cids >= 0, cd, jnp.inf)
    sel, cnt = heuristic.prune(metric, cids, cd, cvecs, cn, 32)
    return jnp.sum(sel.astype(jnp.float32)) + jnp.sum(cnt)


def stage_scanonly(eps, vecs, norms, tids, cids):
    """conflict tensor synthesized cheaply; time moveaxis+scan+compact."""
    from hnswindex_tpu.core import heuristic as H
    r = jax.random.uniform(jax.random.PRNGKey(9), (B, N, N)) + eps * 0
    conflict = r < 0.1
    tri = (jnp.arange(N)[:, None] < jnp.arange(N)[None, :])
    conflict = conflict & tri[None]
    U = 4
    G = -(-N // U)
    Np = G * U
    cols = jnp.moveaxis(conflict, 2, 0)
    cols = jnp.pad(cols, ((0, Np - N), (0, 0), (0, 0)))
    cols_g = cols.reshape(G, U, B, N)
    jbase = jnp.arange(G, dtype=jnp.int32) * U

    def step(acc, xs):
        jb, cg = xs
        hit = jnp.any(cg & acc[None, :, :N], axis=2)

        def intra(p, k):
            return lax.dynamic_slice(cg[k], (0, jb + p), (B, 1))[:, 0]

        a0 = ~hit[0]
        a1 = ~(hit[1] | (a0 & intra(0, 1)))
        a2 = ~(hit[2] | (a0 & intra(0, 2)) | (a1 & intra(1, 2)))
        a3 = ~(hit[3] | (a0 & intra(0, 3)) | (a1 & intra(1, 3))
               | (a2 & intra(2, 3)))
        blk = jnp.stack([a0, a1, a2, a3], axis=1)
        acc = lax.dynamic_update_slice(acc, blk, (0, jb))
        return acc, None

    acc0 = jnp.zeros((B, Np), bool)
    accepted, _ = lax.scan(step, acc0, (jbase, cols_g))
    return jnp.sum(accepted)


timeit("trivial", lambda eps, v, n, t, c: eps + jnp.sum(t) * 0.0, tids, cids)
timeit("gather", stage_gather, tids, cids)
timeit("gather+cd", stage_cd, tids, cids)
timeit("pairwise f32-HIGHEST", stage_pair, tids, cids)
timeit("pairwise bf16", stage_pair_bf16, tids, cids)
timeit("sort+permute", stage_sortperm, tids, cids)
timeit("scan-only (synth conflict)", stage_scanonly, tids, cids)
timeit("FULL prune", stage_full, tids, cids)
print("DONE", file=sys.stderr)
