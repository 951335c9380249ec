"""TPU probe: fused lane-min scan vs panel path at 8.4M rows."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from hnswindex_tpu.ops import distance as dst  # noqa: E402
from hnswindex_tpu.ops.bruteforce import exact_knn2  # noqa: E402
from hnswindex_tpu.ops.fused_scan import lane_min_scan, rank_transform  # noqa: E402

C = 1 << 23
D = 128
R = 8
metric = "sq_euclid"

key = jax.random.PRNGKey(0)
vecs = jax.random.normal(key, (C, D), jnp.float32)
coarse = vecs.astype(jnp.bfloat16)
norms = dst.norm_data(metric, vecs)
active = jnp.ones((C,), bool)
np.asarray(jnp.sum(norms))
print("setup done", file=sys.stderr, flush=True)


def bench(name, fn, *args):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[-1][..., :1])
    t0 = time.perf_counter()
    for _ in range(R):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[-1][..., :1])
    dt = (time.perf_counter() - t0) / R * 1000
    print(f"{name}: {dt:.1f} ms", file=sys.stderr, flush=True)
    return dt


for B in (512, 1024):
    q = jax.random.normal(jax.random.PRNGKey(B), (B, D), jnp.float32)
    excl = jnp.full((B,), -1, jnp.int32)
    mult, bias = rank_transform(metric, norms, active)
    bench(f"kernel-only B={B}",
          lambda q=q, e=excl, m=mult, bi=bias: lane_min_scan(
              coarse, m, bi, q.astype(jnp.bfloat16), e, BS=1024))
    bench(f"exact_knn2 fused B={B} k=100",
          lambda q=q: exact_knn2(metric, vecs, coarse, norms, active, q,
                                 100, fused=True))
    bench(f"exact_knn2 panel B={B} k=100",
          lambda q=q: exact_knn2(metric, vecs, coarse, norms, active, q,
                                 100, fused=False))
    if B == 1024:
        bench(f"exact_knn2 fused B={B} k=10",
              lambda q=q: exact_knn2(metric, vecs, coarse, norms, active,
                                     q, 10, fused=True))
        bench(f"exact_knn2 panel B={B} k=10",
              lambda q=q: exact_knn2(metric, vecs, coarse, norms, active,
                                     q, 10, fused=False))
print("DONE", file=sys.stderr)
