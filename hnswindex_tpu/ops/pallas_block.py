"""Pallas fused block-fetch + score kernel — BlockIndex's hot op.

XLA's gather runs at a fraction of HBM speed on this target even when the
gathered rows are whole 64 KB blocks.  This kernel does the block scoring
the TPU-native way:

* per grid step, a tile of TB queries fetches its PG probed blocks
  (TB*PG async DMAs of contiguous (BS, D) slabs, HBM -> VMEM);
* distances are computed on the MXU with two matmuls — all fetched rows
  against all tile queries (each block then selects its own query's
  column), and a squared-norm matmul against a ones vector — instead of
  VPU elementwise reductions;
* output is the (TB, PG*BS) distance panel; the caller runs the top-k.

DMA count is B*P per batch (64 KB each) — two orders of magnitude fewer
issues than per-row gathers, so the kernel is bandwidth-bound, not
issue-bound.  Falls back to interpret mode off-TPU (CPU tests).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TB = 8   # queries per grid step
_PG = 4   # probed blocks per query per grid step


def _kernel(metric: str, BS: int, D: int, bids_ref, q_ref, vec_ref,
            out_ref, scratch, sem):
    TB, PG = _TB, _PG
    nblk = TB * PG
    i = pl.program_id(0)
    j = pl.program_id(1)

    def issue(r, _):
        idx = jnp.maximum(bids_ref[i * TB + r // PG, j * PG + r % PG], 0)
        pltpu.make_async_copy(vec_ref.at[idx], scratch.at[r], sem).start()
        return 0

    lax.fori_loop(0, nblk, issue, 0)

    def drain(r, _):
        pltpu.make_async_copy(vec_ref.at[0], scratch.at[r], sem).wait()
        return 0

    lax.fori_loop(0, nblk, drain, 0)

    rows = scratch[:].reshape(nblk * BS, D)            # (TB*PG*BS, D)
    q = q_ref[:]                                       # (TB, D)
    # all rows x all tile queries on the MXU; each block keeps only its
    # own query's column below.  f32 inputs use the full-precision MXU
    # passes — the kernel is DMA-bound, so the extra matmul passes are
    # free, and bf16 dot noise would scramble intra-cluster rankings.
    prec = (None if rows.dtype == jnp.bfloat16
            else jax.lax.Precision.HIGHEST)
    dots = jnp.dot(rows, q.T, precision=prec,
                   preferred_element_type=jnp.float32)
    dots = dots.reshape(TB, PG * BS, TB)
    col = jax.lax.broadcasted_iota(jnp.int32, (TB, PG * BS, TB), 2)
    mine = col == jax.lax.broadcasted_iota(jnp.int32, (TB, PG * BS, TB), 0)
    dot = jnp.sum(jnp.where(mine, dots, 0.0), axis=2)  # (TB, PG*BS)

    if metric == "ucosine":
        out_ref[:] = 1.0 - dot
        return
    cn2 = jnp.dot(rows * rows, jnp.ones((D, 1), rows.dtype),
                  precision=prec, preferred_element_type=jnp.float32)
    cn2 = cn2.reshape(TB, PG * BS)
    qn2 = jnp.sum(q * q, axis=1)[:, None]
    if metric == "sq_euclid":
        out_ref[:] = qn2 + cn2 - 2.0 * dot
    else:  # cosine (zero-norm guard -> 1, CosineMetric.cs:88-91)
        denom = jnp.sqrt(qn2) * jnp.sqrt(cn2)
        out_ref[:] = jnp.where(denom > 0.0, 1.0 - dot / denom, 1.0)


@partial(jax.jit, static_argnames=("metric", "interpret"))
def block_scores(metric: str, blk_vecs: jnp.ndarray, bids: jnp.ndarray,
                 q: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """Distance panel (B, P*BS) of each query against its probed blocks.

    ``blk_vecs (NB, BS, D)``, ``bids (B, P)`` (-1 pad allowed; callers mask
    by id), ``q (B, D)``."""
    B, P = bids.shape
    NB, BS, D = blk_vecs.shape
    TB, PG = _TB, _PG
    Bp = -(-B // TB) * TB
    Pp = -(-P // PG) * PG
    if Bp != B or Pp != P:
        bids = jnp.pad(bids, ((0, Bp - B), (0, Pp - P)),
                       constant_values=-1)
        q = jnp.pad(q, ((0, Bp - B), (0, 0)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,           # bids lives in SMEM, whole array
        grid=(Bp // TB, Pp // PG),
        in_specs=[
            pl.BlockSpec((TB, D), lambda i, j, bids: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((TB, PG * BS), lambda i, j, bids: (i, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((TB * PG, BS, D), blk_vecs.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )
    out = pl.pallas_call(
        partial(_kernel, metric, BS, D),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Bp, Pp * BS), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * Bp * Pp * BS * D,
            bytes_accessed=Bp * Pp * BS * D * 4,
            transcendentals=0),
        interpret=interpret,
    )(bids, q.astype(blk_vecs.dtype), blk_vecs)
    return out[:B, :P * BS]
