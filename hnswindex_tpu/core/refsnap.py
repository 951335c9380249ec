"""Reference-format snapshot interchange (protobuf-net wire layout).

The reference serializes ``HNSWIndexSnapshot<float[], float>`` with
protobuf-net (src/HNSWIndex/HNSWIndex.cs:210-229).  This module reads and
writes that exact wire format so indexes can cross the implementation
boundary in both directions:

* ``read_snapshot(path)`` — load a snapshot produced by the reference's
  ``index.Serialize(path)`` into plain numpy structures;
* ``write_snapshot(path, ...)`` — produce a byte stream the reference's
  ``HNSWIndex<float[], float>.Deserialize(distFnc, path)`` accepts.

Wire contracts (field numbers from the [ProtoMember] attributes):

* HNSWIndexSnapshot (HNSWIndexSnapshot.cs:10-17):
    1: Parameters (message)      2: DataSnapshot (message)
* HNSWParameters (HNSWParameters.cs:7-56):
    1: MaxEdges        2: DistributionRate (double)  3: MinNN
    4: MaxCandidates   5: RemoveMaxCandidates        6: CollectionSize
    7: RandomSeed      8: AllowRemovals (bool)
* GraphDataSnapshot (GraphDataSnapshot.cs:10-36): 1: Nodes (repeated
    Node), 2: ActiveNodes (repeated int), 3: Items (repeated
    NestedArrayWrapper<float[]>), 4: RemovedIndexes (repeated int),
    5: EntryPointId, 6: Capacity, 7: Length, 8: Count
* Node (Node.cs:6-27): 1: Id, 2: IsRemoved (bool),
    3: OutEdges (repeated EdgeList), 4: InEdges (repeated EdgeList)
* EdgeList (Node.cs:30-36): 1: Buffer (repeated int), 2: Count
* NestedArrayWrapper<float[]> (NestedListWrapper.cs:15-21):
    1: Values (repeated float)

protobuf-net conventions honored here: ints are two's-complement varints
(negatives are 10 bytes); floats are non-packed fixed32 elements; repeated
ints are non-packed varints; scalar members equal to the CLR default
(0 / false) are skipped on write, and absent fields keep the C# object
initializer's value on read (e.g. ``EntryPointId = -1``,
``AllowRemovals = true``).  EdgeList buffers may carry slack beyond Count
(amortized growth, Node.cs:66-76) — readers truncate to Count.
"""

from __future__ import annotations

import dataclasses
import struct
from typing import Dict, Iterable, List, Optional, Tuple

import numpy as np

from ..params import HNSWParameters

_WIRE_VARINT = 0
_WIRE_F64 = 1
_WIRE_LEN = 2
_WIRE_F32 = 5


# ---------------------------------------------------------------------------
# low-level decode
# ---------------------------------------------------------------------------

def _read_varint(buf: memoryview, pos: int) -> Tuple[int, int]:
    result = 0
    shift = 0
    while True:
        if pos >= len(buf):
            raise ValueError("truncated varint")
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7
        if shift > 70:
            raise ValueError("varint too long")


def _as_int32(u: int) -> int:
    u &= 0xFFFFFFFF
    return u - (1 << 32) if u & 0x80000000 else u


def _fields(buf: memoryview) -> Iterable[Tuple[int, int, object]]:
    """Yield (field_number, wire_type, payload) triples.

    Payload is an int for varints, bytes for length-delimited, and raw
    4/8-byte buffers for fixed32/64.
    """
    pos = 0
    n = len(buf)
    while pos < n:
        key, pos = _read_varint(buf, pos)
        fno, wt = key >> 3, key & 7
        if wt == _WIRE_VARINT:
            val, pos = _read_varint(buf, pos)
            yield fno, wt, val
        elif wt == _WIRE_LEN:
            ln, pos = _read_varint(buf, pos)
            if pos + ln > n:
                raise ValueError("truncated length-delimited field")
            yield fno, wt, buf[pos:pos + ln]
            pos += ln
        elif wt == _WIRE_F32:
            yield fno, wt, buf[pos:pos + 4]
            pos += 4
        elif wt == _WIRE_F64:
            yield fno, wt, buf[pos:pos + 8]
            pos += 8
        else:
            raise ValueError(f"unsupported wire type {wt} (field {fno})")


def _f32(payload) -> float:
    return struct.unpack("<f", payload)[0]


def _f64(payload) -> float:
    return struct.unpack("<d", payload)[0]


# ---------------------------------------------------------------------------
# message parsers
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class RefNode:
    id: int = 0
    is_removed: bool = False
    out_edges: List[np.ndarray] = dataclasses.field(default_factory=list)
    in_edges: List[np.ndarray] = dataclasses.field(default_factory=list)

    @property
    def max_layer(self) -> int:
        return len(self.out_edges) - 1


@dataclasses.dataclass
class RefSnapshot:
    params: HNSWParameters
    nodes: List[RefNode]
    items: List[np.ndarray]
    active: np.ndarray          # int32 active ids
    removed: List[int]          # free-list (stack order as serialized)
    entry_point: int
    capacity: int
    length: int
    count: int


def _packed_varints(payload: memoryview) -> List[int]:
    """Packed repeated varints (spec: readers accept packed and unpacked
    encodings interchangeably, whatever the writer chose)."""
    vals: List[int] = []
    pos = 0
    while pos < len(payload):
        v, pos = _read_varint(payload, pos)
        vals.append(_as_int32(v))
    return vals


def _parse_edge_list(buf: memoryview) -> np.ndarray:
    vals: List[int] = []
    count = 0
    for fno, wt, payload in _fields(buf):
        if fno == 1 and wt == _WIRE_VARINT:
            vals.append(_as_int32(payload))
        elif fno == 1 and wt == _WIRE_LEN:
            vals.extend(_packed_varints(payload))
        elif fno == 2 and wt == _WIRE_VARINT:
            count = _as_int32(payload)
    # Buffer carries slack beyond Count (EdgeList.Grow, Node.cs:95-106)
    return np.asarray(vals[:count], dtype=np.int32)


def _parse_node(buf: memoryview) -> RefNode:
    node = RefNode()
    for fno, wt, payload in _fields(buf):
        if fno == 1 and wt == _WIRE_VARINT:
            node.id = _as_int32(payload)
        elif fno == 2 and wt == _WIRE_VARINT:
            node.is_removed = bool(payload)
        elif fno == 3 and wt == _WIRE_LEN:
            node.out_edges.append(_parse_edge_list(payload))
        elif fno == 4 and wt == _WIRE_LEN:
            node.in_edges.append(_parse_edge_list(payload))
    return node


def _parse_vector(buf: memoryview) -> np.ndarray:
    vals: List[float] = []
    for fno, wt, payload in _fields(buf):
        if fno == 1 and wt == _WIRE_F32:
            vals.append(_f32(payload))
        elif fno == 1 and wt == _WIRE_LEN:    # packed fixed32 floats
            vals.extend(np.frombuffer(payload, dtype="<f4").tolist())
    return np.asarray(vals, dtype=np.float32)


def _parse_parameters(buf: memoryview) -> HNSWParameters:
    # start from the C# object-initializer defaults: protobuf-net skips
    # members at their CLR default on write, and absent fields keep the
    # initializer's value on read (HNSWParameters.cs:13-55)
    p = HNSWParameters()
    for fno, wt, payload in _fields(buf):
        if fno == 1 and wt == _WIRE_VARINT:
            p.max_edges = _as_int32(payload)
        elif fno == 2 and wt == _WIRE_F64:
            p.distribution_rate = _f64(payload)
        elif fno == 3 and wt == _WIRE_VARINT:
            p.min_nn = _as_int32(payload)
        elif fno == 4 and wt == _WIRE_VARINT:
            p.max_candidates = _as_int32(payload)
        elif fno == 5 and wt == _WIRE_VARINT:
            p.remove_max_candidates = _as_int32(payload)
        elif fno == 6 and wt == _WIRE_VARINT:
            p.collection_size = _as_int32(payload)
        elif fno == 7 and wt == _WIRE_VARINT:
            p.random_seed = _as_int32(payload)
        elif fno == 8 and wt == _WIRE_VARINT:
            p.allow_removals = bool(payload)
    return p


def _parse_graph_data(buf: memoryview) -> Dict:
    out: Dict = {"nodes": [], "items": [], "active": [], "removed": [],
                 "entry_point": -1, "capacity": 0, "length": 0, "count": 0}
    for fno, wt, payload in _fields(buf):
        if fno == 1 and wt == _WIRE_LEN:
            out["nodes"].append(_parse_node(payload))
        elif fno == 2 and wt == _WIRE_VARINT:
            out["active"].append(_as_int32(payload))
        elif fno == 2 and wt == _WIRE_LEN:
            out["active"].extend(_packed_varints(payload))
        elif fno == 3 and wt == _WIRE_LEN:
            out["items"].append(_parse_vector(payload))
        elif fno == 4 and wt == _WIRE_VARINT:
            out["removed"].append(_as_int32(payload))
        elif fno == 4 and wt == _WIRE_LEN:
            out["removed"].extend(_packed_varints(payload))
        elif fno == 5 and wt == _WIRE_VARINT:
            out["entry_point"] = _as_int32(payload)
        elif fno == 6 and wt == _WIRE_VARINT:
            out["capacity"] = _as_int32(payload)
        elif fno == 7 and wt == _WIRE_VARINT:
            out["length"] = _as_int32(payload)
        elif fno == 8 and wt == _WIRE_VARINT:
            out["count"] = _as_int32(payload)
    return out


def parse_snapshot(data: bytes) -> RefSnapshot:
    buf = memoryview(data)
    params: Optional[HNSWParameters] = None
    gd: Optional[Dict] = None
    for fno, wt, payload in _fields(buf):
        if fno == 1 and wt == _WIRE_LEN:
            params = _parse_parameters(payload)
        elif fno == 2 and wt == _WIRE_LEN:
            gd = _parse_graph_data(payload)
    if params is None:
        params = HNSWParameters()
    if gd is None:
        raise ValueError("snapshot has no GraphDataSnapshot (field 2)")
    return RefSnapshot(
        params=params, nodes=gd["nodes"], items=gd["items"],
        active=np.asarray(gd["active"], dtype=np.int32),
        removed=gd["removed"], entry_point=gd["entry_point"],
        capacity=gd["capacity"], length=gd["length"], count=gd["count"])


def read_snapshot(path: str) -> RefSnapshot:
    with open(path, "rb") as f:
        return parse_snapshot(f.read())


# ---------------------------------------------------------------------------
# low-level encode
# ---------------------------------------------------------------------------

def _varint(u: int) -> bytes:
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _enc_int(fno: int, v: int, skip_default: bool = True) -> bytes:
    """Two's-complement varint, protobuf-net style: negatives become
    64-bit-wide (10-byte) varints; zero is skipped like the CLR default."""
    v = int(v)
    if v == 0 and skip_default:
        return b""
    key = _varint((fno << 3) | _WIRE_VARINT)
    return key + _varint(v & 0xFFFFFFFFFFFFFFFF if v < 0 else v)


def _enc_bool(fno: int, v: bool) -> bytes:
    if not v:
        return b""               # false == CLR default -> skipped
    return _varint((fno << 3) | _WIRE_VARINT) + b"\x01"


def _enc_double(fno: int, v: float) -> bytes:
    if v == 0.0:
        return b""
    return _varint((fno << 3) | _WIRE_F64) + struct.pack("<d", float(v))


def _enc_msg(fno: int, payload: bytes) -> bytes:
    return _varint((fno << 3) | _WIRE_LEN) + _varint(len(payload)) + payload


def _enc_rep_int(fno: int, vals) -> bytes:
    out = bytearray()
    key = _varint((fno << 3) | _WIRE_VARINT)
    for v in vals:
        v = int(v)
        out += key
        out += _varint(v & 0xFFFFFFFFFFFFFFFF if v < 0 else v)
    return bytes(out)


def _enc_rep_f32(fno: int, vals: np.ndarray) -> bytes:
    out = bytearray()
    key = _varint((fno << 3) | _WIRE_F32)
    for v in np.asarray(vals, dtype=np.float32):
        out += key
        out += struct.pack("<f", float(v))
    return bytes(out)


def _enc_edge_list(edges: np.ndarray) -> bytes:
    # Buffer exactly Count long (a fresh EdgeList(IEnumerable) layout)
    return _enc_rep_int(1, edges) + _enc_int(2, len(edges))


def _enc_node(node: RefNode) -> bytes:
    out = bytearray()
    out += _enc_int(1, node.id)
    out += _enc_bool(2, node.is_removed)
    for e in node.out_edges:
        out += _enc_msg(3, _enc_edge_list(e))
    for e in node.in_edges:
        out += _enc_msg(4, _enc_edge_list(e))
    return bytes(out)


def _enc_parameters(p: HNSWParameters) -> bytes:
    out = bytearray()
    out += _enc_int(1, p.max_edges)
    out += _enc_double(2, p.distribution_rate)
    out += _enc_int(3, p.min_nn)
    out += _enc_int(4, p.max_candidates)
    out += _enc_int(5, p.remove_max_candidates)
    out += _enc_int(6, p.collection_size)
    out += _enc_int(7, p.random_seed)
    out += _enc_bool(8, p.allow_removals)
    return bytes(out)


def encode_snapshot(snap: RefSnapshot) -> bytes:
    gd = bytearray()
    for node in snap.nodes:
        gd += _enc_msg(1, _enc_node(node))
    gd += _enc_rep_int(2, snap.active)
    for item in snap.items:
        gd += _enc_msg(3, _enc_rep_f32(1, item))
    gd += _enc_rep_int(4, snap.removed)
    gd += _enc_int(5, snap.entry_point)
    gd += _enc_int(6, snap.capacity)
    gd += _enc_int(7, snap.length)
    gd += _enc_int(8, snap.count)
    return _enc_msg(1, _enc_parameters(snap.params)) + _enc_msg(2, bytes(gd))


def write_snapshot(path: str, snap: RefSnapshot) -> None:
    with open(path, "wb") as f:
        f.write(encode_snapshot(snap))
