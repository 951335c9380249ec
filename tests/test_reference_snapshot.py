"""Reference protobuf-net snapshot interchange (core/refsnap.py).

Wire-format compatibility is gated against an *independent* codec: the same
message schema is declared in proto2 via google.protobuf dynamic messages
(proto2's conventions — non-packed repeated scalars, two's-complement
varint int32, fixed32 floats — are exactly protobuf-net's for these
contracts), and bytes are round-tripped across the two implementations in
both directions.
"""

import numpy as np
import pytest

from hnswindex_tpu import HNSWIndex, HNSWParameters
from hnswindex_tpu.core import refsnap


def _proto_messages():
    """Build the reference schema with google.protobuf (independent codec)."""
    from google.protobuf import descriptor_pb2, descriptor_pool
    from google.protobuf import message_factory

    fdp = descriptor_pb2.FileDescriptorProto()
    fdp.name = "hnsw_ref.proto"
    fdp.package = "hnswref"
    fdp.syntax = "proto2"

    def msg(name):
        m = fdp.message_type.add()
        m.name = name
        return m

    F = descriptor_pb2.FieldDescriptorProto

    def field(m, name, number, ftype, label=F.LABEL_OPTIONAL,
              type_name=None):
        f = m.field.add()
        f.name = name
        f.number = number
        f.type = ftype
        f.label = label
        if type_name:
            f.type_name = type_name

    el = msg("EdgeList")
    field(el, "buffer", 1, F.TYPE_INT32, F.LABEL_REPEATED)
    field(el, "count", 2, F.TYPE_INT32)

    nd = msg("Node")
    field(nd, "id", 1, F.TYPE_INT32)
    field(nd, "is_removed", 2, F.TYPE_BOOL)
    field(nd, "out_edges", 3, F.TYPE_MESSAGE, F.LABEL_REPEATED,
          ".hnswref.EdgeList")
    field(nd, "in_edges", 4, F.TYPE_MESSAGE, F.LABEL_REPEATED,
          ".hnswref.EdgeList")

    vec = msg("Vec")
    field(vec, "values", 1, F.TYPE_FLOAT, F.LABEL_REPEATED)

    par = msg("Params")
    field(par, "max_edges", 1, F.TYPE_INT32)
    field(par, "distribution_rate", 2, F.TYPE_DOUBLE)
    field(par, "min_nn", 3, F.TYPE_INT32)
    field(par, "max_candidates", 4, F.TYPE_INT32)
    field(par, "remove_max_candidates", 5, F.TYPE_INT32)
    field(par, "collection_size", 6, F.TYPE_INT32)
    field(par, "random_seed", 7, F.TYPE_INT32)
    field(par, "allow_removals", 8, F.TYPE_BOOL)

    gd = msg("GraphData")
    field(gd, "nodes", 1, F.TYPE_MESSAGE, F.LABEL_REPEATED, ".hnswref.Node")
    field(gd, "active", 2, F.TYPE_INT32, F.LABEL_REPEATED)
    field(gd, "items", 3, F.TYPE_MESSAGE, F.LABEL_REPEATED, ".hnswref.Vec")
    field(gd, "removed", 4, F.TYPE_INT32, F.LABEL_REPEATED)
    field(gd, "entry_point", 5, F.TYPE_INT32)
    field(gd, "capacity", 6, F.TYPE_INT32)
    field(gd, "length", 7, F.TYPE_INT32)
    field(gd, "count", 8, F.TYPE_INT32)

    snap = msg("Snapshot")
    field(snap, "parameters", 1, F.TYPE_MESSAGE, type_name=".hnswref.Params")
    field(snap, "data", 2, F.TYPE_MESSAGE, type_name=".hnswref.GraphData")

    pool = descriptor_pool.DescriptorPool()
    pool.Add(fdp)
    names = ["hnswref." + m for m in
             ("EdgeList", "Node", "Vec", "Params", "GraphData", "Snapshot")]
    msgs = message_factory.GetMessageClassesForFiles(
        ["hnsw_ref.proto"], pool)
    return {n.split(".")[-1]: msgs[n] for n in names}


@pytest.fixture(scope="module")
def built(tmp_path_factory):
    rng = np.random.default_rng(7)
    vecs = rng.random((400, 32), dtype=np.float32)
    idx = HNSWIndex(32, parameters=HNSWParameters(
        collection_size=400, max_candidates=32))
    ids = idx.add(vecs)
    idx.remove(ids[350:380])
    path = str(tmp_path_factory.mktemp("refsnap") / "ref.bin")
    idx.to_reference_snapshot(path)
    return idx, vecs, ids, path


def test_independent_codec_reads_our_bytes(built):
    idx, vecs, ids, path = built
    M = _proto_messages()
    snap = M["Snapshot"]()
    with open(path, "rb") as f:
        snap.ParseFromString(f.read())

    assert snap.parameters.max_edges == idx.params.max_edges
    assert snap.parameters.max_candidates == idx.params.max_candidates
    assert snap.parameters.allow_removals is True
    assert snap.data.length == idx._length
    assert snap.data.count == idx.count
    assert snap.data.capacity == idx._state.capacity
    assert snap.data.entry_point == int(np.asarray(idx._state.ep))
    assert sorted(snap.data.active) == sorted(int(x) for x in idx.ids())
    assert sorted(snap.data.removed) == sorted(idx._free)
    assert len(snap.data.nodes) == idx._length
    assert len(snap.data.items) == idx._length

    # spot-check graph rows + the in/out mirror invariant
    from hnswindex_tpu.core.graph import dense_tables
    nbr, deg = dense_tables(idx._state)
    cap0 = 2 * idx.params.max_edges
    for node in list(snap.data.nodes)[:50]:
        s = node.id
        for l, e in enumerate(node.out_edges):
            got = list(e.buffer)[:e.count]
            if l == 0 and deg[0, s] > cap0:
                # live rows may transiently exceed the reference's 2M cap
                # (params.reverse_slack); the export re-prunes them back
                # to <= 2M, selecting from the live row's edges
                assert len(got) <= cap0
                assert set(got) <= set(int(x) for x in
                                       nbr[0, s, :deg[0, s]])
            else:
                assert got == list(nbr[l, s, :deg[l, s]])
        for l, e in enumerate(node.in_edges):
            for src in list(e.buffer)[:e.count]:
                assert s in list(nbr[l, src, :deg[l, src]])
    # items round float32-exact
    it0 = np.asarray(list(snap.data.items)[0].values, np.float32)
    np.testing.assert_array_equal(it0, vecs[0])


def test_import_independent_codec_bytes(built, tmp_path):
    """Encode with google.protobuf, import with from_reference_snapshot:
    queries must agree exactly with the source index (the reference's own
    serialization bar, GraphSerializationTests.cs:29-42)."""
    idx, vecs, ids, path = built
    M = _proto_messages()
    snap = M["Snapshot"]()
    with open(path, "rb") as f:
        snap.ParseFromString(f.read())
    p2 = tmp_path / "ref2.bin"
    p2.write_bytes(snap.SerializeToString())

    idx2 = HNSWIndex.from_reference_snapshot(str(p2))
    assert idx2.count == idx.count
    assert sorted(idx2._free) == sorted(idx._free)
    q = vecs[:64]
    i1, d1 = idx.knn_query(q, k=5)
    i2, d2 = idx2.knn_query(q, k=5)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(d1, d2, rtol=1e-6)


def test_own_roundtrip(built, tmp_path):
    idx, vecs, ids, path = built
    idx2 = HNSWIndex.from_reference_snapshot(path)
    q = vecs[:64]
    i1, d1 = idx.knn_query(q, k=5)
    i2, d2 = idx2.knn_query(q, k=5)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(d1, d2, rtol=1e-6)
    # mutations still work on the imported index
    idx2.add(vecs[:8] + 0.5)
    assert idx2.count == idx.count + 8


def test_negative_and_default_conventions(tmp_path):
    """protobuf-net quirks: negative ints are 10-byte varints; members at
    the CLR default (0/false) are skipped and absent fields keep the C#
    initializer values (EntryPointId=-1, AllowRemovals=true)."""
    M = _proto_messages()
    snap = refsnap.RefSnapshot(
        params=HNSWParameters(), nodes=[], items=[np.zeros(4, np.float32)],
        active=np.empty(0, np.int32), removed=[-3], entry_point=-1,
        capacity=8, length=0, count=0)
    data = refsnap.encode_snapshot(snap)

    g = M["Snapshot"]()
    g.ParseFromString(data)
    assert g.data.entry_point == -1
    assert list(g.data.removed) == [-3]

    back = refsnap.parse_snapshot(g.SerializeToString())
    assert back.entry_point == -1
    assert back.removed == [-3]
    assert back.capacity == 8
    # count==0 skipped on the wire, parsed back as 0
    assert back.count == 0
    # defaults survive an empty Params message
    empty = refsnap.parse_snapshot(
        refsnap._enc_msg(1, b"") + refsnap._enc_msg(2, b""))
    assert empty.params.max_edges == 16
    assert empty.params.allow_removals is True
    assert empty.entry_point == -1


def test_golden_fixture_bytes():
    """Frozen interchange fixture: bytes produced by the independent
    google.protobuf codec, checked into the repo.  Guards against the
    two codecs drifting together in a later change.  (A byte stream from
    the actual .NET protobuf-net library is environment-blocked — no
    dotnet runtime in this image — so the frozen independent encoding is
    the strongest available gate; see docs/PARITY.md #13.)"""
    import os
    here = os.path.join(os.path.dirname(__file__), "fixtures")
    blob = os.path.join(here, "refsnap_golden.bin")
    exp = np.load(os.path.join(here, "refsnap_golden_expected.npz"))

    snap = refsnap.parse_snapshot(open(blob, "rb").read())
    assert snap.count == int(exp["count"])
    assert sorted(snap.removed) == exp["free"].tolist()
    assert snap.entry_point == int(exp["ep"])

    idx = HNSWIndex.from_reference_snapshot(blob)
    assert idx.count == int(exp["count"])
    gi, gd = idx.knn_query(exp["queries"], k=5)
    np.testing.assert_array_equal(gi, exp["ids"])
    np.testing.assert_allclose(gd, exp["dists"], rtol=1e-6, equal_nan=True)


def test_packed_encodings_accepted():
    """Conforming readers accept packed AND unpacked repeated scalars
    (another protobuf-net/version degree of freedom retired): hand-pack
    the repeated fields and parse."""
    import struct

    def packed_varints(fno, vals):
        payload = b"".join(
            refsnap._varint(v & 0xFFFFFFFFFFFFFFFF if v < 0 else v)
            for v in vals)
        return refsnap._enc_msg(fno, payload)

    def packed_f32(fno, vals):
        return refsnap._enc_msg(
            fno, b"".join(struct.pack("<f", v) for v in vals))

    edge = packed_varints(1, [5, -1, 7]) + refsnap._enc_int(2, 2)
    node = (refsnap._enc_int(1, 3)
            + refsnap._enc_msg(3, edge))      # out_edges layer 0
    vec = packed_f32(1, [1.5, -2.25])
    gd = (refsnap._enc_msg(1, node)
          + packed_varints(2, [3])            # active, packed
          + refsnap._enc_msg(3, vec)
          + packed_varints(4, [-3, 9])        # removed, packed
          + refsnap._enc_int(6, 8) + refsnap._enc_int(7, 4)
          + refsnap._enc_int(8, 1))
    data = refsnap._enc_msg(1, b"") + refsnap._enc_msg(2, gd)

    snap = refsnap.parse_snapshot(data)
    assert snap.active.tolist() == [3]
    assert snap.removed == [-3, 9]
    assert snap.nodes[0].id == 3
    assert snap.nodes[0].out_edges[0].tolist() == [5, -1]  # count=2 trim
    np.testing.assert_allclose(snap.items[0], [1.5, -2.25])
