"""Index serialization: save / restore the whole graph.

TPU-native replacement for the reference's protobuf-net snapshot system
(src/HNSWIndex/HNSWIndexSnapshot.cs:9-25, GraphDataSnapshot.cs:10-70,
HNSWIndex.cs:210-229).  Matching the reference's design decisions:

* parameters are embedded in the snapshot (HNSWIndexSnapshot.cs:13);
* the free-slot list, entry point, capacity/length and active ids are all
  preserved (GraphDataSnapshot.cs:62-67);
* the distance function is code, not data — the metric *name* is stored
  and revalidated on load (the reference re-supplies the delegate at
  Deserialize, HNSWIndex.cs:222);
* arrays are stored compacted to ``length`` rows and re-padded to capacity
  on load (GraphDataSnapshot.cs:37-55's ParsedItems/ParsedNodes).

Format: a single ``.npz`` with a JSON header — numpy's container format is
the natural TPU-host interchange and loads straight into device arrays.
Round-trip is exact, which the reference's tests demand
(GraphSerializationTests.cs:29-42: identical ids *and* distances).
"""

from __future__ import annotations

import dataclasses
import json

import jax.numpy as jnp
import numpy as np

from ..ops import distance as dst
from ..params import HNSWParameters
from .graph import GraphConfig, GraphState

FORMAT_VERSION = 2   # v2: layer-0 and upper-layer tables stored split


def npz_path(path) -> str:
    """np.savez_compressed appends ".npz" when missing; loaders must mirror
    that so serialize("x") / deserialize("x") round-trips."""
    p = str(path)
    return p if p.endswith(".npz") else p + ".npz"

# magic of the native C++ host engine's snapshot (native/hnsw_host.cpp)
_HOST_MAGIC = b"HNSWHST1"


def load_host_snapshot(path: str):
    """Parse a native host-engine snapshot (hnsw_host.cpp serialize format)
    into (params, metric, dim, per-node levels/vectors/edges, free list,
    entry point) — the cross-engine migration path: build on CPU with the
    native engine, serve on TPU."""
    import struct

    with open(path, "rb") as f:
        data = f.read()
    if data[:8] != _HOST_MAGIC:
        raise ValueError("not a host-engine snapshot")
    off = 8

    def r32():
        nonlocal off
        v = struct.unpack_from("<i", data, off)[0]
        off += 4
        return v

    dim = r32()
    metric_i = r32()
    metric = ("sq_euclid", "cosine", "ucosine")[metric_i]
    p = HNSWParameters()
    p.max_edges = r32()
    p.min_nn = r32()
    p.max_candidates = r32()
    p.remove_max_candidates = r32()
    p.collection_size = r32()
    p.random_seed = r32()
    p.allow_removals = bool(r32())
    p.distribution_rate = struct.unpack_from("<d", data, off)[0]
    off += 8
    capacity = r32()
    length = r32()
    entry = r32()
    count = r32()
    nfree = r32()
    free = [r32() for _ in range(nfree)]

    levels = np.full(length, -1, np.int32)
    removed = np.zeros(length, bool)
    vectors = np.zeros((length, dim), np.float32)
    edges = [None] * length
    for i in range(length):
        levels[i] = r32()
        removed[i] = bool(r32())
        if levels[i] < 0:
            continue
        vectors[i] = np.frombuffer(data, np.float32, dim, off)
        off += 4 * dim
        node_edges = []
        for _ in range(levels[i] + 1):
            deg = r32()
            node_edges.append(
                np.frombuffer(data, np.int32, deg, off).copy())
            off += 4 * deg
        edges[i] = node_edges
    return (p, metric, dim, capacity, length, entry, count, free, levels,
            removed, vectors, edges)


def save(path: str, cfg: GraphConfig, params: HNSWParameters,
         state: GraphState, length: int, free: list[int],
         dim: int) -> None:
    header = {
        "format_version": FORMAT_VERSION,
        "dim": dim,
        "metric": cfg.metric,
        "length": int(length),
        "capacity": int(state.capacity),
        "max_levels": int(state.num_levels),
        "ep": int(state.ep),
        "count": int(state.count),
        "parameters": dataclasses.asdict(params),
    }
    n = int(length)
    np.savez_compressed(
        path,
        header=np.frombuffer(json.dumps(header).encode(), dtype=np.uint8),
        vectors=np.asarray(state.vectors)[:n],
        norms=np.asarray(state.norms)[:n],
        level=np.asarray(state.level)[:n],
        nbr0=np.asarray(state.nbr0)[:n, :],
        deg0=np.asarray(state.deg0)[:n],
        nbru=np.asarray(state.nbru)[:, :n, :],
        degu=np.asarray(state.degu)[:, :n],
        active=np.asarray(state.active)[:n],
        free=np.asarray(free, dtype=np.int32),
    )


def load(path: str):
    """Returns (header dict, params, state arrays re-padded to capacity,
    free list)."""
    with np.load(npz_path(path)) as z:
        header = json.loads(bytes(z["header"]).decode())
        if header["format_version"] != FORMAT_VERSION:
            raise ValueError(
                f"unsupported snapshot version {header['format_version']}")
        # The distance function is code, not data: fail at load time if the
        # stored metric is unknown (custom metrics must be re-registered
        # before deserialize), matching the reference's re-supplied-delegate
        # contract (HNSWIndex.cs:222).
        dst.check_metric(header["metric"])
        C = header["capacity"]
        n = header["length"]
        L = header["max_levels"]
        D = header["dim"]
        pad = C - n

        vecs = jnp.asarray(np.pad(z["vectors"], ((0, pad), (0, 0))))
        state = GraphState(
            vectors=vecs,
            vlo_store=vecs[:0],  # rebuilt by the caller per its rank_dtype
            coarse=jnp.zeros((0,) + vecs.shape[1:], jnp.bfloat16),
            norms=jnp.asarray(np.pad(z["norms"], (0, pad))),
            level=jnp.asarray(np.pad(z["level"], (0, pad),
                                     constant_values=-1)),
            nbr0=jnp.asarray(np.pad(z["nbr0"], ((0, pad), (0, 0)),
                                    constant_values=-1)),
            deg0=jnp.asarray(np.pad(z["deg0"], (0, pad))),
            nbru=jnp.asarray(np.pad(z["nbru"], ((0, 0), (0, pad), (0, 0)),
                                    constant_values=-1)),
            degu=jnp.asarray(np.pad(z["degu"], ((0, 0), (0, pad)))),
            active=jnp.asarray(np.pad(z["active"], (0, pad))),
            ep=jnp.asarray(header["ep"], jnp.int32),
            count=jnp.asarray(header["count"], jnp.int32),
        )
        assert state.vectors.shape == (C, D)
        assert state.num_levels == L
        params = HNSWParameters(**header["parameters"])
        free = [int(x) for x in z["free"]]
    return header, params, state, free
