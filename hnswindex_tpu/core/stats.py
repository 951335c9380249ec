"""Graph introspection: per-layer degree statistics + connected components.

TPU-native replacement for ``HNSWInfo`` (src/HNSWIndex/HNSWInfo.cs:5-53)
and the weakly-connected-component counter
(GraphNavigator.cs:331-419).  Degree statistics are plain masked reductions
over the padded neighbor table; in-degrees — which the reference reads from
its maintained ``Node.InEdges`` lists — are recovered exactly with one
scatter-add over the out-edge table.  Components are counted with min-label
propagation over the undirected closure (out-edges + in-edges, matching the
reference's BFS over ``outgoingEdges`` ∪ ``incomingEdges``,
GraphNavigator.cs:397-415).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import List

import jax
import jax.numpy as jnp
from jax import lax
import numpy as np

from .graph import GraphConfig, GraphState


@dataclasses.dataclass
class LayerInfo:
    """Mirror of HNSWInfo.LayerInfo (HNSWInfo.cs:18-52)."""
    layer_id: int
    nodes_count: int
    max_out_edges: int
    min_out_edges: int
    max_in_edges: int
    min_in_edges: int
    avg_out_edges: float
    avg_in_edges: float
    out_edges_median: int
    in_edges_median: int


@dataclasses.dataclass
class HNSWInfo:
    """Mirror of HNSWInfo (HNSWInfo.cs:5-16)."""
    layers: List[LayerInfo]


@partial(jax.jit, static_argnames=("cfg", "layer"))
def _layer_degrees(cfg: GraphConfig, state: GraphState, layer: int):
    """(out_degree, in_degree, on_layer) for one layer over active nodes."""
    from .graph import nbr_slice

    C = state.capacity
    nbr_l, deg_l = nbr_slice(state, layer)
    on_layer = state.active & (state.level >= layer)
    valid_edge = (nbr_l >= 0) & on_layer[:, None]
    indeg = jnp.zeros((C + 1,), jnp.int32).at[
        jnp.where(valid_edge, nbr_l, C)].add(1)[:C]
    return jnp.where(on_layer, deg_l, 0), indeg, on_layer


def graph_info(cfg: GraphConfig, state: GraphState,
               report_in_edges: bool = True) -> HNSWInfo:
    """Build per-layer degree stats (HNSWIndex.GetInfo, HNSWIndex.cs:192).

    ``report_in_edges=False`` mirrors the AllowRemovals=false reference
    behavior of reporting zero in-edge statistics (HNSWInfo.cs:39-42 with
    empty InEdges lists)."""
    ep = int(state.ep)
    if ep < 0:
        return HNSWInfo(layers=[])
    top = int(np.asarray(state.level)[ep])
    layers = []
    for l in range(top + 1):
        outd, ind, on_layer = _layer_degrees(cfg, state, l)
        on = np.asarray(on_layer)
        od = np.asarray(outd)[on]
        idg = np.asarray(ind)[on]
        if od.size == 0:
            continue
        if not report_in_edges:
            idg = np.zeros_like(idg)

        def med(a):
            s = np.sort(a)
            n = s.size
            return int((s[n // 2 - 1] + s[n // 2]) // 2) if n % 2 == 0 \
                else int(s[n // 2])

        layers.append(LayerInfo(
            layer_id=l, nodes_count=int(od.size),
            max_out_edges=int(od.max()), min_out_edges=int(od.min()),
            max_in_edges=int(idg.max()), min_in_edges=int(idg.min()),
            avg_out_edges=float(od.mean()), avg_in_edges=float(idg.mean()),
            out_edges_median=med(od), in_edges_median=med(idg)))
    return HNSWInfo(layers=layers)


@partial(jax.jit, static_argnames=("cfg", "layer", "max_iters"))
def _components_at_layer(cfg: GraphConfig, state: GraphState, layer: int,
                         max_iters: int):
    """Count weakly connected components at one layer via min-label
    propagation along out-edges (gather) and in-edges (scatter-min)."""
    from .graph import nbr_slice

    C = state.capacity
    nbr_l, _ = nbr_slice(state, layer)
    on_layer = state.active & (state.level >= layer)
    ids = jnp.arange(C, dtype=jnp.int32)
    labels0 = jnp.where(on_layer, ids, C)
    edge_ok = (nbr_l >= 0) & on_layer[:, None]
    # only propagate across edges whose target is also on the layer
    tgt = jnp.clip(nbr_l, 0, C - 1)
    edge_ok = edge_ok & on_layer[tgt]

    def body(carry):
        labels, _, it = carry
        nl = jnp.where(edge_ok, labels[tgt], C)
        pull = jnp.min(nl, axis=1)                        # via out-edges
        new = jnp.minimum(labels, pull)
        # push my label to my out-neighbors (their in-edge view)
        new = new.at[jnp.where(edge_ok, nbr_l, C)].min(
            jnp.broadcast_to(labels[:, None], nbr_l.shape), mode="drop")
        changed = jnp.any(new != labels)
        return new, changed, it + 1

    def cond(carry):
        _, changed, it = carry
        return changed & (it < max_iters)

    labels, _, _ = lax.while_loop(
        cond, body, (labels0, jnp.asarray(True), jnp.asarray(0, jnp.int32)))
    roots = on_layer & (labels == ids)
    return jnp.sum(roots, dtype=jnp.int32), jnp.any(on_layer)


def connected_component_counts(cfg: GraphConfig,
                               state: GraphState) -> List[int]:
    """Per-layer weak-component counts (GetConnectedComponentCounts,
    HNSWIndex.cs:202-205; empty graph -> [] per GraphNavigator.cs:333)."""
    if int(state.count) == 0 or int(state.ep) < 0:
        return []
    top = int(np.asarray(state.level)[int(state.ep)])
    counts = []
    for l in range(top + 1):
        c, nonempty = _components_at_layer(cfg, state, l,
                                           max_iters=state.capacity)
        counts.append(int(c) if bool(nonempty) else 0)
    return counts
