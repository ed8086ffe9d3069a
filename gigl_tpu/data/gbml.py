"""GBML wire-format interop: read/write the reference's sample protos.

The reference's data plane speaks protobuf: every Subgraph Sampler / Split
Generator artifact is a TFRecord file of serialized
``snapchat.research.gbml`` messages (ref schemas:
proto/snapchat/research/gbml/graph_schema.proto:5-62 and
training_samples_schema.proto:16-65; writer:
scala/common/src/main/scala/utils/TFRecordIO.scala:53 writeDatasetToTfrecord).
A team migrating from the reference has terabytes of these artifacts; this
module lets gigl_tpu consume them directly (and emit them for downstream
reference consumers) WITHOUT a protobuf-codegen dependency: it is a
hand-rolled proto3 wire codec for exactly the GBML messages, built on the
same varint helpers as our tf.Example codec (gigl_tpu/data/tfexample.py).

Message ↔ class map (field numbers are the wire contract and match the
reference schemas cited above):

  Node                                -> GbmlNode        (graph_schema.proto:5)
  Edge                                -> GbmlEdge        (graph_schema.proto:16)
  EdgeType                            -> (our types.graph.EdgeType)
  GraphMetadata                       -> encode/decode_graph_metadata
                                         (graph_schema.proto:44)
  Graph                               -> GbmlGraph       (graph_schema.proto:58)
  Label                               -> GbmlLabel       (training_samples_schema.proto:8)
  RootedNodeNeighborhood              -> RootedNodeNeighborhoodPb    (:16)
  SupervisedNodeClassificationSample  -> SupervisedNodeClassificationSamplePb (:24)
  NodeAnchorBasedLinkPredictionSample -> NodeAnchorBasedLinkPredictionSamplePb (:33)
  SupervisedLinkBasedTaskSample       -> SupervisedLinkBasedTaskSamplePb (:56)

Decoding follows proto3 rules: unknown fields are skipped, repeated scalar
fields accept both packed and unpacked encodings, missing optional scalars
decode to None. Encoding always packs repeated floats (what the reference's
ScalaPB/TF writers produce).

Higher-level converters turn decoded samples into this framework's native
containers (HeteroGraph, NALP supervision arrays) — see
``hetero_graph_from_samples`` / ``nalp_supervision_from_samples`` — and turn
our on-device sampled blocks back into reference-format protos
(``sampled_blocks_to_rooted_neighborhoods``).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field
from typing import Dict, Iterable, Iterator, List, Optional, Sequence, Tuple

import numpy as np

from gigl_tpu.data.tfexample import (
    _read_varint,
    _tag,
    _write_len_delimited,
    _write_varint,
)
from gigl_tpu.types.graph import (
    DEFAULT_HOMOGENEOUS_EDGE_TYPE,
    DEFAULT_HOMOGENEOUS_NODE_TYPE,
    EdgeType,
    GraphMetadata,
)

# ---------------------------------------------------------------------------
# generic proto3 wire helpers
# ---------------------------------------------------------------------------

_WIRE_VARINT, _WIRE_64BIT, _WIRE_LEN, _WIRE_32BIT = 0, 1, 2, 5


def _iter_wire(buf: bytes) -> Iterator[Tuple[int, int, object]]:
    """Yield (field_number, wire_type, value) over a serialized message.

    value is int for varint/32/64-bit fields (raw little-endian bits for the
    fixed widths), bytes for length-delimited fields.
    """
    pos, end = 0, len(buf)
    while pos < end:
        tag, pos = _read_varint(buf, pos)
        fnum, wire = tag >> 3, tag & 7
        if wire == _WIRE_VARINT:
            v, pos = _read_varint(buf, pos)
            yield fnum, wire, v
        elif wire == _WIRE_LEN:
            n, pos = _read_varint(buf, pos)
            yield fnum, wire, buf[pos:pos + n]
            pos += n
        elif wire == _WIRE_32BIT:
            yield fnum, wire, int.from_bytes(buf[pos:pos + 4], "little")
            pos += 4
        elif wire == _WIRE_64BIT:
            yield fnum, wire, int.from_bytes(buf[pos:pos + 8], "little")
            pos += 8
        else:
            raise ValueError(f"unsupported wire type {wire} (field {fnum})")


def _write_uint(out: bytearray, fnum: int, v: int) -> None:
    _write_varint(out, _tag(fnum, _WIRE_VARINT))
    _write_varint(out, int(v))


def _write_packed_floats(out: bytearray, fnum: int, vals: np.ndarray) -> None:
    if len(vals) == 0:
        return
    payload = np.asarray(vals, dtype="<f4").tobytes()
    _write_len_delimited(out, fnum, payload)


def _floats_from_wire(wire: int, value) -> np.ndarray:
    """Repeated float field: packed (len-delimited) or single 32-bit entry."""
    if wire == _WIRE_LEN:
        return np.frombuffer(value, dtype="<f4").astype(np.float32)
    if wire == _WIRE_32BIT:
        return np.array(
            [struct.unpack("<f", int(value).to_bytes(4, "little"))[0]],
            dtype=np.float32,
        )
    raise ValueError(f"bad wire type {wire} for repeated float")


def _int32_from_varint(v: int) -> int:
    """proto int32: negative values arrive as 64-bit two's complement."""
    v &= (1 << 64) - 1
    if v >= 1 << 63:
        v -= 1 << 64
    return int(v)


def _write_string(out: bytearray, fnum: int, s: str) -> None:
    if s:
        _write_len_delimited(out, fnum, s.encode("utf-8"))


# ---------------------------------------------------------------------------
# message classes + codecs
# ---------------------------------------------------------------------------

_EMPTY_F32 = np.zeros((0,), dtype=np.float32)


@dataclass
class GbmlNode:
    """graph_schema.proto:5 Node."""

    node_id: int
    condensed_node_type: Optional[int] = None
    feature_values: np.ndarray = field(default_factory=lambda: _EMPTY_F32)

    def encode(self) -> bytes:
        out = bytearray()
        if self.node_id:
            _write_uint(out, 1, self.node_id)
        if self.condensed_node_type is not None:
            _write_uint(out, 2, self.condensed_node_type)
        _write_packed_floats(out, 3, self.feature_values)
        return bytes(out)

    @classmethod
    def decode(cls, buf: bytes) -> "GbmlNode":
        node = cls(node_id=0)
        feats: List[np.ndarray] = []
        for fnum, wire, value in _iter_wire(buf):
            if fnum == 1 and wire == _WIRE_VARINT:
                node.node_id = int(value)
            elif fnum == 2 and wire == _WIRE_VARINT:
                node.condensed_node_type = int(value)
            elif fnum == 3:
                feats.append(_floats_from_wire(wire, value))
        if feats:
            node.feature_values = np.concatenate(feats)
        return node


@dataclass
class GbmlEdge:
    """graph_schema.proto:16 Edge."""

    src_node_id: int
    dst_node_id: int
    condensed_edge_type: Optional[int] = None
    feature_values: np.ndarray = field(default_factory=lambda: _EMPTY_F32)

    def encode(self) -> bytes:
        out = bytearray()
        if self.src_node_id:
            _write_uint(out, 1, self.src_node_id)
        if self.dst_node_id:
            _write_uint(out, 2, self.dst_node_id)
        if self.condensed_edge_type is not None:
            _write_uint(out, 3, self.condensed_edge_type)
        _write_packed_floats(out, 4, self.feature_values)
        return bytes(out)

    @classmethod
    def decode(cls, buf: bytes) -> "GbmlEdge":
        edge = cls(src_node_id=0, dst_node_id=0)
        feats: List[np.ndarray] = []
        for fnum, wire, value in _iter_wire(buf):
            if fnum == 1 and wire == _WIRE_VARINT:
                edge.src_node_id = int(value)
            elif fnum == 2 and wire == _WIRE_VARINT:
                edge.dst_node_id = int(value)
            elif fnum == 3 and wire == _WIRE_VARINT:
                edge.condensed_edge_type = int(value)
            elif fnum == 4:
                feats.append(_floats_from_wire(wire, value))
        if feats:
            edge.feature_values = np.concatenate(feats)
        return edge


@dataclass
class GbmlGraph:
    """graph_schema.proto:58 Graph (nodes = field 2, edges = field 3)."""

    nodes: List[GbmlNode] = field(default_factory=list)
    edges: List[GbmlEdge] = field(default_factory=list)

    def encode(self) -> bytes:
        out = bytearray()
        for n in self.nodes:
            _write_len_delimited(out, 2, n.encode())
        for e in self.edges:
            _write_len_delimited(out, 3, e.encode())
        return bytes(out)

    @classmethod
    def decode(cls, buf: bytes) -> "GbmlGraph":
        g = cls()
        for fnum, wire, value in _iter_wire(buf):
            if fnum == 2 and wire == _WIRE_LEN:
                g.nodes.append(GbmlNode.decode(value))
            elif fnum == 3 and wire == _WIRE_LEN:
                g.edges.append(GbmlEdge.decode(value))
        return g


@dataclass
class GbmlLabel:
    """training_samples_schema.proto:8 Label (label is int32, may be negative)."""

    label_type: str = ""
    label: int = 0

    def encode(self) -> bytes:
        out = bytearray()
        _write_string(out, 1, self.label_type)
        if self.label:
            _write_uint(out, 2, self.label if self.label >= 0
                        else self.label + (1 << 64))
        return bytes(out)

    @classmethod
    def decode(cls, buf: bytes) -> "GbmlLabel":
        lbl = cls()
        for fnum, wire, value in _iter_wire(buf):
            if fnum == 1 and wire == _WIRE_LEN:
                lbl.label_type = value.decode("utf-8")
            elif fnum == 2 and wire == _WIRE_VARINT:
                lbl.label = _int32_from_varint(value)
        return lbl


@dataclass
class RootedNodeNeighborhoodPb:
    """training_samples_schema.proto:16 RootedNodeNeighborhood."""

    root_node: GbmlNode
    neighborhood: GbmlGraph = field(default_factory=GbmlGraph)

    def encode(self) -> bytes:
        out = bytearray()
        _write_len_delimited(out, 1, self.root_node.encode())
        _write_len_delimited(out, 2, self.neighborhood.encode())
        return bytes(out)

    @classmethod
    def decode(cls, buf: bytes) -> "RootedNodeNeighborhoodPb":
        s = cls(root_node=GbmlNode(node_id=0))
        for fnum, wire, value in _iter_wire(buf):
            if fnum == 1 and wire == _WIRE_LEN:
                s.root_node = GbmlNode.decode(value)
            elif fnum == 2 and wire == _WIRE_LEN:
                s.neighborhood = GbmlGraph.decode(value)
        return s


@dataclass
class SupervisedNodeClassificationSamplePb:
    """training_samples_schema.proto:24 SupervisedNodeClassificationSample."""

    root_node: GbmlNode
    neighborhood: GbmlGraph = field(default_factory=GbmlGraph)
    root_node_labels: List[GbmlLabel] = field(default_factory=list)

    def encode(self) -> bytes:
        out = bytearray()
        _write_len_delimited(out, 1, self.root_node.encode())
        _write_len_delimited(out, 2, self.neighborhood.encode())
        for lbl in self.root_node_labels:
            _write_len_delimited(out, 3, lbl.encode())
        return bytes(out)

    @classmethod
    def decode(cls, buf: bytes) -> "SupervisedNodeClassificationSamplePb":
        s = cls(root_node=GbmlNode(node_id=0))
        for fnum, wire, value in _iter_wire(buf):
            if fnum == 1 and wire == _WIRE_LEN:
                s.root_node = GbmlNode.decode(value)
            elif fnum == 2 and wire == _WIRE_LEN:
                s.neighborhood = GbmlGraph.decode(value)
            elif fnum == 3 and wire == _WIRE_LEN:
                s.root_node_labels.append(GbmlLabel.decode(value))
        return s


@dataclass
class NodeAnchorBasedLinkPredictionSamplePb:
    """training_samples_schema.proto:33 NodeAnchorBasedLinkPredictionSample.

    Field numbers: root_node=1, hard_neg_edges=2, neighborhood=3, pos_edges=4,
    neg_edges=5 (deprecated random negatives kept for wire compatibility).
    """

    root_node: GbmlNode
    hard_neg_edges: List[GbmlEdge] = field(default_factory=list)
    pos_edges: List[GbmlEdge] = field(default_factory=list)
    neg_edges: List[GbmlEdge] = field(default_factory=list)
    neighborhood: GbmlGraph = field(default_factory=GbmlGraph)

    def encode(self) -> bytes:
        out = bytearray()
        _write_len_delimited(out, 1, self.root_node.encode())
        for e in self.hard_neg_edges:
            _write_len_delimited(out, 2, e.encode())
        _write_len_delimited(out, 3, self.neighborhood.encode())
        for e in self.pos_edges:
            _write_len_delimited(out, 4, e.encode())
        for e in self.neg_edges:
            _write_len_delimited(out, 5, e.encode())
        return bytes(out)

    @classmethod
    def decode(cls, buf: bytes) -> "NodeAnchorBasedLinkPredictionSamplePb":
        s = cls(root_node=GbmlNode(node_id=0))
        for fnum, wire, value in _iter_wire(buf):
            if wire != _WIRE_LEN:
                continue
            if fnum == 1:
                s.root_node = GbmlNode.decode(value)
            elif fnum == 2:
                s.hard_neg_edges.append(GbmlEdge.decode(value))
            elif fnum == 3:
                s.neighborhood = GbmlGraph.decode(value)
            elif fnum == 4:
                s.pos_edges.append(GbmlEdge.decode(value))
            elif fnum == 5:
                s.neg_edges.append(GbmlEdge.decode(value))
        return s


@dataclass
class SupervisedLinkBasedTaskSamplePb:
    """training_samples_schema.proto:56 SupervisedLinkBasedTaskSample."""

    root_edge: GbmlEdge
    neighborhood: GbmlGraph = field(default_factory=GbmlGraph)
    root_edge_labels: List[GbmlLabel] = field(default_factory=list)

    def encode(self) -> bytes:
        out = bytearray()
        _write_len_delimited(out, 1, self.root_edge.encode())
        _write_len_delimited(out, 2, self.neighborhood.encode())
        for lbl in self.root_edge_labels:
            _write_len_delimited(out, 3, lbl.encode())
        return bytes(out)

    @classmethod
    def decode(cls, buf: bytes) -> "SupervisedLinkBasedTaskSamplePb":
        s = cls(root_edge=GbmlEdge(src_node_id=0, dst_node_id=0))
        for fnum, wire, value in _iter_wire(buf):
            if fnum == 1 and wire == _WIRE_LEN:
                s.root_edge = GbmlEdge.decode(value)
            elif fnum == 2 and wire == _WIRE_LEN:
                s.neighborhood = GbmlGraph.decode(value)
            elif fnum == 3 and wire == _WIRE_LEN:
                s.root_edge_labels.append(GbmlLabel.decode(value))
        return s


# ---------------------------------------------------------------------------
# GraphMetadata (graph_schema.proto:44) ↔ our typed GraphMetadata
# ---------------------------------------------------------------------------

def _encode_edge_type(et: EdgeType) -> bytes:
    out = bytearray()
    _write_string(out, 1, str(et.relation))
    _write_string(out, 2, str(et.src_node_type))
    _write_string(out, 3, str(et.dst_node_type))
    return bytes(out)


def _decode_edge_type(buf: bytes) -> EdgeType:
    relation = src = dst = ""
    for fnum, wire, value in _iter_wire(buf):
        if wire != _WIRE_LEN:
            continue
        if fnum == 1:
            relation = value.decode("utf-8")
        elif fnum == 2:
            src = value.decode("utf-8")
        elif fnum == 3:
            dst = value.decode("utf-8")
    return EdgeType(src, relation, dst)


def encode_graph_metadata(md: GraphMetadata) -> bytes:
    out = bytearray()
    for nt in md.node_types:
        _write_string(out, 1, str(nt))
    for et in md.edge_types:
        _write_len_delimited(out, 2, _encode_edge_type(et))
    for cet, et in md.condensed_edge_type_map.items():
        entry = bytearray()
        _write_uint(entry, 1, int(cet))
        _write_len_delimited(entry, 2, _encode_edge_type(et))
        _write_len_delimited(out, 3, bytes(entry))
    for cnt, nt in md.condensed_node_type_map.items():
        entry = bytearray()
        _write_uint(entry, 1, int(cnt))
        _write_string(entry, 2, str(nt))
        _write_len_delimited(out, 4, bytes(entry))
    return bytes(out)


def decode_graph_metadata(buf: bytes) -> GraphMetadata:
    node_types: List[str] = []
    edge_types: List[EdgeType] = []
    cet_map: Dict[int, EdgeType] = {}
    cnt_map: Dict[int, str] = {}
    for fnum, wire, value in _iter_wire(buf):
        if wire != _WIRE_LEN:
            continue
        if fnum == 1:
            node_types.append(value.decode("utf-8"))
        elif fnum == 2:
            edge_types.append(_decode_edge_type(value))
        elif fnum == 3:
            k, v = 0, EdgeType("", "", "")
            for efn, ew, ev in _iter_wire(value):
                if efn == 1 and ew == _WIRE_VARINT:
                    k = int(ev)
                elif efn == 2 and ew == _WIRE_LEN:
                    v = _decode_edge_type(ev)
            cet_map[k] = v
        elif fnum == 4:
            k, s = 0, ""
            for efn, ew, ev in _iter_wire(value):
                if efn == 1 and ew == _WIRE_VARINT:
                    k = int(ev)
                elif efn == 2 and ew == _WIRE_LEN:
                    s = ev.decode("utf-8")
            cnt_map[k] = s
    return GraphMetadata(
        node_types=tuple(node_types),
        edge_types=tuple(edge_types),
        condensed_node_type_map=cnt_map,
        condensed_edge_type_map=cet_map,
    )


# ---------------------------------------------------------------------------
# TFRecord-level readers/writers (record payload = serialized sample proto,
# matching the reference's writeDatasetToTfrecord ByteArray mode)
# ---------------------------------------------------------------------------

def read_samples(path: str, sample_cls) -> Iterator:
    """Yield decoded samples from a TFRecord file of serialized protos."""
    from gigl_tpu import native

    for payload in native.tfrecord_read(path):
        yield sample_cls.decode(payload)


def write_samples(path: str, samples: Iterable) -> int:
    """Write samples (any class above) to a TFRecord file. Returns count."""
    from gigl_tpu import native

    return native.tfrecord_write(path, (s.encode() for s in samples))


# ---------------------------------------------------------------------------
# converters: GBML samples -> native containers
# ---------------------------------------------------------------------------

def hetero_graph_from_samples(
    samples: Sequence,
    metadata: Optional[GraphMetadata] = None,
):
    """Union the neighborhoods of decoded samples into one HeteroGraph.

    This is the inverse of the reference's per-sample materialization: the
    v1 trainer coalesces sample neighborhoods into a batch graph per step
    (ref: v1/lib/data_loaders/node_anchor_based_link_prediction_data_loader.py:90-220
    collate); on TPU we instead rebuild the full (deduped) graph once and
    run on-device sampling over it, so imported reference artifacts flow
    into the same training path as natively-ingested graphs.

    Samples may be RootedNodeNeighborhoodPb, SupervisedNodeClassificationSamplePb
    or NodeAnchorBasedLinkPredictionSamplePb (their ``neighborhood``/
    ``root_node`` shape is shared). Missing condensed types default to 0
    (proto3 "assumed homogeneous", graph_schema.proto:8-10).

    Returns (HeteroGraph, labels) where labels is a dict
    node_type -> {node_id: label} for classification samples (empty otherwise).
    """
    metadata = metadata or GraphMetadata.homogeneous()
    cnt_map = dict(metadata.condensed_node_type_map)
    cet_map = dict(metadata.condensed_edge_type_map)

    node_feats: Dict[str, Dict[int, np.ndarray]] = {
        str(nt): {} for nt in metadata.node_types
    }
    max_id: Dict[str, int] = {str(nt): -1 for nt in metadata.node_types}
    edge_sets: Dict[EdgeType, set] = {et: set() for et in metadata.edge_types}
    labels: Dict[str, Dict[int, int]] = {}

    def node_type_of(n: GbmlNode) -> str:
        return str(cnt_map[n.condensed_node_type or 0])

    def add_node(n: GbmlNode) -> None:
        nt = node_type_of(n)
        max_id[nt] = max(max_id[nt], n.node_id)
        if len(n.feature_values) and n.node_id not in node_feats[nt]:
            node_feats[nt][n.node_id] = n.feature_values

    def add_edge(e: GbmlEdge) -> None:
        et = cet_map[e.condensed_edge_type or 0]
        edge_sets[et].add((e.src_node_id, e.dst_node_id))
        max_id[str(et.src_node_type)] = max(
            max_id[str(et.src_node_type)], e.src_node_id)
        max_id[str(et.dst_node_type)] = max(
            max_id[str(et.dst_node_type)], e.dst_node_id)

    for s in samples:
        root = getattr(s, "root_node", None)
        if root is not None:
            add_node(root)
        for n in s.neighborhood.nodes:
            add_node(n)
        for e in s.neighborhood.edges:
            add_edge(e)
        for e in getattr(s, "pos_edges", ()):  # supervision edges are part
            add_edge(e)                        # of the graph's edge set too
        for e in getattr(s, "hard_neg_edges", ()):
            # hard negatives are NOT structural edges; only their endpoint
            # nodes must exist (ref: training_samples_schema.proto:37-39
            # "fake edges").
            nt = str(cet_map[e.condensed_edge_type or 0].dst_node_type)
            max_id[nt] = max(max_id[nt], e.dst_node_id)
        if root is not None and getattr(s, "root_node_labels", None):
            nt = node_type_of(root)
            labels.setdefault(nt, {})[root.node_id] = s.root_node_labels[0].label

    from gigl_tpu.graph.csr import HeteroGraph

    num_nodes = {nt: max_id[str(nt)] + 1 for nt in metadata.node_types}
    edges = {}
    for et in metadata.edge_types:
        pairs = sorted(edge_sets[et])
        arr = (np.array(pairs, dtype=np.int64).T if pairs
               else np.zeros((2, 0), dtype=np.int64))
        edges[et] = arr
    g = HeteroGraph(metadata=metadata, num_nodes=num_nodes, edges=edges)
    for nt in metadata.node_types:
        feats = node_feats[str(nt)]
        if feats:
            dim = len(next(iter(feats.values())))
            mat = np.zeros((num_nodes[nt], dim), dtype=np.float32)
            for nid, fv in feats.items():
                mat[nid, : len(fv)] = fv
            g.node_features[str(nt)] = mat
    label_arrays: Dict[str, np.ndarray] = {}
    for nt, by_id in labels.items():
        arr = np.full((num_nodes[nt],), -1, dtype=np.int64)
        for nid, lbl in by_id.items():
            arr[nid] = lbl
        g.node_labels[nt] = arr
        label_arrays[nt] = arr
    return g, label_arrays


def nalp_supervision_from_samples(
    samples: Sequence[NodeAnchorBasedLinkPredictionSamplePb],
    metadata: Optional[GraphMetadata] = None,
) -> Dict[EdgeType, Dict[str, np.ndarray]]:
    """Extract the NALP supervision structure from decoded samples.

    Returns, per condensed edge type: anchors [A] (unique roots with >= 1 pos
    edge, in first-seen order), pos_edges [2, P], hard_neg_edges [2, H] —
    the arrays our trainers take as ``supervision_edges`` / hard negatives
    (contract per SURVEY Appendix A.2: pos + hard-neg per root, random negs
    are batch-shared and never materialized per sample).
    """
    metadata = metadata or GraphMetadata.homogeneous()
    cet_map = dict(metadata.condensed_edge_type_map)
    out: Dict[EdgeType, Dict[str, List]] = {
        et: {"anchors": [], "pos": [], "hard_neg": []}
        for et in metadata.edge_types
    }
    seen_anchor: Dict[EdgeType, set] = {et: set() for et in metadata.edge_types}
    for s in samples:
        for e in s.pos_edges:
            et = cet_map[e.condensed_edge_type or 0]
            out[et]["pos"].append((e.src_node_id, e.dst_node_id))
            if s.root_node.node_id not in seen_anchor[et]:
                seen_anchor[et].add(s.root_node.node_id)
                out[et]["anchors"].append(s.root_node.node_id)
        for e in s.hard_neg_edges:
            et = cet_map[e.condensed_edge_type or 0]
            out[et]["hard_neg"].append((e.src_node_id, e.dst_node_id))

    def pack(pairs: List[Tuple[int, int]]) -> np.ndarray:
        return (np.array(pairs, dtype=np.int64).T if pairs
                else np.zeros((2, 0), dtype=np.int64))

    return {
        et: {
            "anchors": np.array(v["anchors"], dtype=np.int64),
            "pos_edges": pack(v["pos"]),
            "hard_neg_edges": pack(v["hard_neg"]),
        }
        for et, v in out.items()
    }


# ---------------------------------------------------------------------------
# converters: native sampled blocks -> GBML protos (export for reference
# consumers)
# ---------------------------------------------------------------------------

def sampled_blocks_to_rooted_neighborhoods(
    blocks,
    node_features: Optional[np.ndarray] = None,
    *,
    condensed_node_type: Optional[int] = None,
    condensed_edge_type: Optional[int] = None,
    direction: str = "INCOMING",
) -> List[RootedNodeNeighborhoodPb]:
    """Convert homogeneous SampledBlocks into RootedNodeNeighborhood protos.

    One proto per root; nodes deduped within a sample; block-tree edges
    (parent at hop l-1, sampled neighbor at hop l) become Edge messages with
    src=neighbor, dst=parent for INCOMING (the neighbor points *into* the
    frontier node — ref subgraph_sampling_strategy.proto:26-29) and the
    reverse for OUTGOING. Masked slots are skipped, so isolated roots yield
    an empty (nodes-only) neighborhood — matching the reference's
    neighborless RootedNodeNeighborhood emission
    (SGSPureSparkV1Task.scala:902 createNeighborlessNodesSubgraph).
    """
    node_ids = [np.asarray(a) for a in blocks.node_ids]
    masks = [np.asarray(m) for m in blocks.masks]
    batch = node_ids[0].shape[0]
    out: List[RootedNodeNeighborhoodPb] = []

    def make_node(nid: int) -> GbmlNode:
        fv = (node_features[nid].astype(np.float32)
              if node_features is not None else _EMPTY_F32)
        return GbmlNode(node_id=int(nid),
                        condensed_node_type=condensed_node_type,
                        feature_values=fv)

    for b in range(batch):
        root = int(node_ids[0][b])
        nodes_seen = {root}
        edges: List[GbmlEdge] = []
        edge_seen = set()
        for hop in range(1, len(node_ids)):
            parents = node_ids[hop - 1][b].reshape(-1)
            children = node_ids[hop][b].reshape(len(parents), -1)
            valid_p = (masks[hop - 1][b].reshape(-1)
                       if hop > 1 else np.ones((1,), dtype=bool))
            valid_c = masks[hop][b].reshape(len(parents), -1)
            for pi in range(len(parents)):
                if not valid_p[pi]:
                    continue
                parent = int(parents[pi])
                for ci in range(children.shape[1]):
                    if not valid_c[pi, ci]:
                        continue
                    child = int(children[pi, ci])
                    nodes_seen.add(child)
                    pair = ((child, parent) if direction == "INCOMING"
                            else (parent, child))
                    if pair in edge_seen:
                        continue
                    edge_seen.add(pair)
                    edges.append(GbmlEdge(
                        src_node_id=pair[0], dst_node_id=pair[1],
                        condensed_edge_type=condensed_edge_type))
        out.append(RootedNodeNeighborhoodPb(
            root_node=make_node(root),
            neighborhood=GbmlGraph(
                nodes=[make_node(n) for n in sorted(nodes_seen)],
                edges=edges),
        ))
    return out


# ---------------------------------------------------------------------------
# sample output validation (the prod-path validator, not just a test helper)
# ---------------------------------------------------------------------------

def validate_samples(samples, metadata: Optional[GraphMetadata] = None) -> int:
    """Validate emitted samples the way the reference's SGS does.

    Ref parity: TaskOutputValidator.validateMainSamples /
    validateRootedNodeNeighborhoodSamples (scala/subgraph_sampler/src/main/
    scala/libs/task/TaskOutputValidator.scala:29,60): for every edge of a
    sample — neighborhood edges plus, for NALP samples, pos/neg/hard-neg
    supervision edges — both typed endpoints (node_id, condensed_node_type
    per the edge's condensed type and the metadata map) must be present in
    the sample's neighborhood node set. Raises ValueError on the first
    violation; returns the number of samples validated.
    """
    metadata = metadata or GraphMetadata.homogeneous()
    cet_map = dict(metadata.condensed_edge_type_map)
    nt_to_cnt = {str(v): int(k)
                 for k, v in metadata.condensed_node_type_map.items()}
    count = 0
    for s in samples:
        nodes = {(n.node_id, n.condensed_node_type or 0)
                 for n in s.neighborhood.nodes}
        edges = list(s.neighborhood.edges)
        edges += list(getattr(s, "pos_edges", ()))
        edges += list(getattr(s, "neg_edges", ()))
        edges += list(getattr(s, "hard_neg_edges", ()))
        for e in edges:
            et = cet_map[e.condensed_edge_type or 0]
            endpoints = (
                (e.src_node_id, nt_to_cnt[str(et.src_node_type)]),
                (e.dst_node_id, nt_to_cnt[str(et.dst_node_type)]),
            )
            for ep in endpoints:
                if ep not in nodes:
                    raise ValueError(
                        f"Output validation failed: node {ep} of edge "
                        f"({e.src_node_id} -> {e.dst_node_id}, type {et}) "
                        f"not present in the sample's neighborhood nodes")
        count += 1
    return count


def link_supervision_from_samples(
    samples: Sequence[SupervisedLinkBasedTaskSamplePb],
    metadata: Optional[GraphMetadata] = None,
) -> Dict[EdgeType, Dict[str, np.ndarray]]:
    """Extract labeled edges from SupervisedLinkBasedTaskSample protos.

    Returns, per condensed edge type: edges [2, E] and labels [E] (the
    first root_edge_label's value; -1 when a sample carries none) — the
    input contract of training.link_task.LinkClassificationTrainer.
    """
    metadata = metadata or GraphMetadata.homogeneous()
    cet_map = dict(metadata.condensed_edge_type_map)
    out: Dict[EdgeType, Dict[str, List[int]]] = {
        et: {"src": [], "dst": [], "label": []}
        for et in metadata.edge_types
    }
    for s in samples:
        e = s.root_edge
        et = cet_map[e.condensed_edge_type or 0]
        out[et]["src"].append(e.src_node_id)
        out[et]["dst"].append(e.dst_node_id)
        out[et]["label"].append(
            s.root_edge_labels[0].label if s.root_edge_labels else -1)
    return {
        et: {
            "edges": np.array([v["src"], v["dst"]], dtype=np.int64),
            "labels": np.array(v["label"], dtype=np.int64),
        }
        for et, v in out.items()
    }
