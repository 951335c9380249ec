"""Graph storage: dense, fixed-shape HBM arrays.

TPU-native replacement for the reference's pointer-based storage
(src/HNSWIndex/GraphData.cs:12-278, Node.cs:1-107, ActiveSet.cs:1-125).
Where the reference keeps a ``Node[]`` of per-node ``EdgeList`` objects with
three locks apiece, the TPU build keeps one padded int32 neighbor table per
level and updates it with functional array scatters — data races are
structurally impossible, so the entire lock fabric (GraphLocker.cs,
Node.cs:12-16, GraphData.cs:16,21,29) has no equivalent here.

Layout (C = capacity, D = dim, L = max levels):

* ``vectors  (C, D) f32`` — the reference's ``Items[]`` (GraphData.cs:18).
* ``norms    (C,)   f32`` — cached metric norm data (no reference analog;
  enables dot-product distance decomposition on the MXU).
* ``level    (C,)   i32`` — per-node top layer (``Node.MaxLayer``,
  Node.cs:27); -1 for never-used slots.
* ``nbr0 (C, 2M+slack0) i32`` — layer-0 out-edges, -1 padded; row u holds
  ``deg0[u]`` valid entries in columns [0, deg).  Replaces
  ``Node.OutEdges[0]`` (Node.cs:22); layer 0's degree cap is 2*M
  (GraphData.cs:247-250), plus ``cfg.slack0`` spare columns that absorb
  reverse arrivals between overflow re-prunes (see GraphConfig.slack0 —
  degrees may transiently reach 2M+slack0).  Slots >= deg are always -1
  (invariant).
* ``deg0     (C,) i32`` — layer-0 out-degree (EdgeList.Count).
* ``nbru (L-1, C, M) i32`` / ``degu (L-1, C) i32`` — layers 1..L-1, whose
  degree cap is M.  Splitting the hierarchy off the base layer halves the
  upper tables' width (the former uniform (L, C, 2M) table wasted
  ~(L-1)*C*M*4 bytes on empty lanes — 3.2 GB at 8M rows), keeping the hot
  layer-0 rows dense and 128-byte aligned.
* ``active   (C,) bool`` — live-node set, replacing ``ActiveSet``
  (ActiveSet.cs:72-97).
* ``ep       ()   i32`` — entry point id (GraphData.cs:22), -1 when empty.
* ``count    ()   i32`` — number of active nodes (GraphData.cs:26).

There is no in-edge table: the reference maintains ``Node.InEdges`` purely
to find in-neighbors during removals (GraphData.cs:227-233); the TPU build
recovers in-neighbors exactly with a vectorized equality scan over ``nbr``
(see core/remove.py), trading a bandwidth-cheap full-table pass for
unbounded per-node in-edge storage.
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import distance as dst


@dataclasses.dataclass(frozen=True)
class GraphConfig:
    """Static (hashable) compile-time configuration for graph kernels."""

    dim: int
    metric: str = "sq_euclid"
    max_edges: int = 16        # M
    max_levels: int = 8        # L: static level-table height
    ef_construction: int = 100
    search_iter_factor: int = 8
    build_expand: int = 8      # beam nodes expanded per construction step
    #: dtype of the *ranking* vector table used by graph traversal.
    #: "bfloat16" halves gather bandwidth and uses the MXU's native input
    #: type; distances that reach users are always refined in full
    #: precision afterwards.  "float32" keeps traversal exact (CPU/test
    #: default).
    rank_dtype: str = "float32"
    #: Extra layer-0 row columns beyond the 2M degree cap.  A full row
    #: absorbs up to ``slack0`` reverse arrivals into the spare columns
    #: before the overflow re-prune fires (construct._add_reverse prunes
    #: back down to 2M when a row would exceed the STORAGE width), so the
    #: re-prune — the single largest steady-state wave cost — runs ~
    #: slack0+1 times less often per row.  The reference prunes on every
    #: overflow (GraphConnector.cs:209-211) because its rows are exactly
    #: 2M wide; rows here may transiently hold up to 2M+slack0 edges
    #: (searches simply read a few more lanes — row gathers are
    #: row-count-bound on TPU, so the extra columns are ~free to
    #: traverse).  Snapshot exports in reference formats re-prune
    #: over-cap rows back to 2M first.
    slack0: int = 0

    def max_degree(self, layer_is_base: bool) -> int:
        return 2 * self.max_edges if layer_is_base else self.max_edges


class GraphState(NamedTuple):
    """Device-array pytree holding the whole index (see module docstring)."""

    vectors: jnp.ndarray   # (C, D) f32 (exact store)
    #: low-precision ranking copy (cfg.rank_dtype), or a 0-size sentinel
    #: when ranking runs on the exact f32 vectors (saves C*D*4 bytes of
    #: HBM — 4 GB at 8M x 128); read through the ``vlo`` property.
    vlo_store: jnp.ndarray
    #: bf16 mirror for two-stage exact scans (coarse MXU-native pass +
    #: f32 rescore of oversampled survivors, ops/bruteforce.exact_knn2);
    #: 0-size sentinel for custom metrics (no exact path) and when
    #: ``vlo_store`` is already bf16 (it then serves as the coarse table).
    coarse: jnp.ndarray
    norms: jnp.ndarray     # (C,)   f32
    level: jnp.ndarray     # (C,)   i32
    nbr0: jnp.ndarray      # (C, 2M)     i32 layer-0 out-edges
    deg0: jnp.ndarray      # (C,)        i32
    nbru: jnp.ndarray      # (L-1, C, M) i32 upper-layer out-edges
    degu: jnp.ndarray      # (L-1, C)    i32
    active: jnp.ndarray    # (C,)   bool
    ep: jnp.ndarray        # ()     i32
    count: jnp.ndarray     # ()     i32

    @property
    def vlo(self) -> jnp.ndarray:
        """The ranking vector table (falls back to the exact store)."""
        return self.vectors if self.vlo_store.size == 0 else self.vlo_store

    @property
    def coarse_table(self) -> jnp.ndarray | None:
        """bf16 table for two-stage exact scans, or None (custom metric)."""
        if self.coarse.size:
            return self.coarse
        if self.vlo_store.size and self.vlo_store.dtype == jnp.bfloat16:
            return self.vlo_store
        return None

    @property
    def capacity(self) -> int:
        return self.vectors.shape[0]

    @property
    def num_levels(self) -> int:
        return self.nbru.shape[0] + 1


def nbr_slice(state: GraphState, layer: int):
    """(nbr_l (C, K_l), deg_l (C,)) for a *static* layer index.

    Layer 0 rows are (C, 2M); upper layers (C, M).  Static indexing makes
    the slice alias the parameter — a traced index would copy the layer."""
    if int(layer) == 0:
        return state.nbr0, state.deg0
    return state.nbru[int(layer) - 1], state.degu[int(layer) - 1]


def with_nbr_slice(state: GraphState, layer: int, nbr_l, deg_l
                   ) -> GraphState:
    """State with one layer's (nbr_l, deg_l) slice replaced (static
    layer)."""
    if int(layer) == 0:
        return state._replace(nbr0=nbr_l, deg0=deg_l)
    return state._replace(
        nbru=state.nbru.at[int(layer) - 1].set(nbr_l),
        degu=state.degu.at[int(layer) - 1].set(deg_l))


def upper_rows(state: GraphState, lay, ids):
    """Gather upper-layer ((lay,) >= 1, traced) neighbor rows for ``ids``.

    Used by the greedy descent, which only ever walks layers >= 1
    (stop_layer >= 0); rows for lanes whose ``lay`` is out of range are
    garbage and must be masked by the caller."""
    Lu = state.nbru.shape[0]
    layu = jnp.clip(lay - 1, 0, Lu - 1)
    return state.nbru[layu, ids]


def dense_tables(state: GraphState):
    """Host-side dense (L, C, K0) nbr / (L, C) deg view of the split
    tables (tests / debugging only — this materializes exactly the padded
    layout the split design keeps off the device)."""
    nbr0 = np.asarray(state.nbr0)
    C, K0 = nbr0.shape
    L = state.num_levels
    Ku = state.nbru.shape[2]
    nbr = np.full((L, C, K0), -1, np.int32)
    nbr[0] = nbr0
    nbr[1:, :, :Ku] = np.asarray(state.nbru)
    deg = np.concatenate([np.asarray(state.deg0)[None],
                          np.asarray(state.degu)], axis=0)
    return nbr, deg


def make_vlo(rank_dtype, vectors: jnp.ndarray) -> jnp.ndarray:
    """Build the ``vlo_store`` leaf for ``vectors``: a cast copy for
    low-precision ranking, or the 0-size sentinel when the ranking dtype
    matches the exact store (reads then alias ``vectors``)."""
    d = jnp.dtype(rank_dtype)
    if d == vectors.dtype:
        return jnp.zeros((0,) + vectors.shape[1:], d)
    return jnp.asarray(vectors, dtype=d)


def update_vlo(state: GraphState, rows, vecs) -> jnp.ndarray:
    """Scatter ``vecs`` into the ranking copy (no-op on the sentinel)."""
    vs = state.vlo_store
    if vs.size == 0:
        return vs
    return vs.at[rows].set(vecs.astype(vs.dtype), mode="drop")


def make_coarse(cfg: GraphConfig, vectors: jnp.ndarray) -> jnp.ndarray:
    """Build the ``coarse`` leaf: a bf16 cast of ``vectors``, or the 0-size
    sentinel when no exact path exists (custom metric) or ``vlo`` already
    provides a bf16 table."""
    if dst.is_custom(cfg.metric) or \
            jnp.dtype(cfg.rank_dtype) == jnp.bfloat16:
        return jnp.zeros((0,) + vectors.shape[1:], jnp.bfloat16)
    return jnp.asarray(vectors, dtype=jnp.bfloat16)


def update_coarse(state: GraphState, rows, vecs) -> jnp.ndarray:
    """Scatter ``vecs`` into the coarse mirror (no-op on the sentinel)."""
    cs = state.coarse
    if cs.size == 0:
        return cs
    return cs.at[rows].set(vecs.astype(jnp.bfloat16), mode="drop")


def default_max_levels(capacity: int, distribution_rate: float) -> int:
    """Static level-table height: expected max level + slack.

    Levels are sampled as floor(-ln(U) * mL) (GraphData.cs:211-219); the
    expected maximum over N draws is ~ln(N) * mL.  Oversampled levels are
    clamped to the table height (+2 slack: the chance any node clamps is
    ~1/(e^2 * mL) per corpus; clamping only shortens the descent
    hierarchy, exactly like hnswlib's level cap)."""
    exp_max = math.log(max(capacity, 2)) * max(distribution_rate, 1e-6)
    return max(4, int(exp_max) + 2)


def empty_state(cfg: GraphConfig, capacity: int) -> GraphState:
    C, D, L = capacity, cfg.dim, cfg.max_levels
    lo = jnp.dtype(cfg.rank_dtype)
    use_coarse = not dst.is_custom(cfg.metric) and lo != jnp.bfloat16
    return GraphState(
        vectors=jnp.zeros((C, D), jnp.float32),
        vlo_store=jnp.zeros((0 if lo == jnp.float32 else C, D), lo),
        coarse=jnp.zeros((C if use_coarse else 0, D), jnp.bfloat16),
        norms=jnp.zeros((C,), jnp.float32),
        level=jnp.full((C,), -1, jnp.int32),
        nbr0=jnp.full((C, 2 * cfg.max_edges + cfg.slack0), -1, jnp.int32),
        deg0=jnp.zeros((C,), jnp.int32),
        nbru=jnp.full((L - 1, C, cfg.max_edges), -1, jnp.int32),
        degu=jnp.zeros((L - 1, C), jnp.int32),
        active=jnp.zeros((C,), bool),
        ep=jnp.asarray(-1, jnp.int32),
        count=jnp.asarray(0, jnp.int32),
    )


def grow_state(state: GraphState, new_capacity: int) -> GraphState:
    """Capacity growth by padding (reference doubles arrays under the index
    lock, GraphData.cs:95-115; here it is a functional reallocate-and-copy).
    """
    C = state.capacity
    if new_capacity <= C:
        return state
    pad = new_capacity - C
    return GraphState(
        vectors=jnp.pad(state.vectors, ((0, pad), (0, 0))),
        vlo_store=(state.vlo_store if state.vlo_store.size == 0 else
                   jnp.pad(state.vlo_store, ((0, pad), (0, 0)))),
        coarse=(state.coarse if state.coarse.size == 0 else
                jnp.pad(state.coarse, ((0, pad), (0, 0)))),
        norms=jnp.pad(state.norms, (0, pad)),
        level=jnp.pad(state.level, (0, pad), constant_values=-1),
        nbr0=jnp.pad(state.nbr0, ((0, pad), (0, 0)), constant_values=-1),
        deg0=jnp.pad(state.deg0, (0, pad)),
        nbru=jnp.pad(state.nbru, ((0, 0), (0, pad), (0, 0)),
                     constant_values=-1),
        degu=jnp.pad(state.degu, ((0, 0), (0, pad))),
        active=jnp.pad(state.active, (0, pad)),
        ep=state.ep,
        count=state.count,
    )


def sample_levels(rng: np.random.Generator, n: int,
                  distribution_rate: float, max_levels: int) -> np.ndarray:
    """Vectorized exponential level sampling.

    level = floor(-ln(U) * mL), U ~ Uniform(0,1) — GraphData.cs:211-219.
    The host-side RNG is consumed sequentially so that seeded builds are
    reproducible (parameters_test.py:60-81)."""
    u = rng.random(n)
    u = np.clip(u, 1e-30, None)
    lv = np.floor(-np.log(u) * distribution_rate).astype(np.int32)
    return np.clip(lv, 0, max_levels - 1)


@partial(jax.jit, static_argnames=("cfg",), donate_argnames=("state",))
def _seed_first_node(cfg: GraphConfig, state: GraphState, slot, v, lvl
                     ) -> GraphState:
    return state._replace(
        vectors=state.vectors.at[slot].set(v),
        vlo_store=update_vlo(state, slot, v),
        coarse=update_coarse(state, slot, v),
        norms=state.norms.at[slot].set(dst.norm_data(cfg.metric, v)),
        level=state.level.at[slot].set(lvl.astype(jnp.int32)),
        active=state.active.at[slot].set(True),
        ep=slot.astype(jnp.int32),
        count=state.count + 1,
    )


def seed_first_node(cfg: GraphConfig, state: GraphState, slot: int,
                    vec: np.ndarray, lvl: int) -> GraphState:
    """Insert the very first node: it becomes the entry point with no edges
    (GraphConnector.cs:27-33).

    One donated jit program: op-by-op ``.at[].set`` outside jit copies
    every multi-GB state leaf it touches (17+ GB transient at 8M rows —
    an instant OOM on the very first insert)."""
    return _seed_first_node(cfg, state, jnp.asarray(slot, jnp.int32),
                            jnp.asarray(vec, jnp.float32),
                            jnp.asarray(lvl, jnp.int32))
