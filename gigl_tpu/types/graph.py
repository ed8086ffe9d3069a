"""Graph typing primitives: node/edge types, relations, condensed type maps.

TPU-native re-design of the reference's graph type system
(ref: python/gigl/src/common/types/graph_data.py). The reference wraps these in
protobuf (`proto/snapchat/research/gbml/graph_schema.proto:5-62`); here they are
plain frozen dataclasses with YAML/dict round-trip, because the config backbone
of this framework is typed Python + YAML rather than protobuf codegen.

Key concepts kept for parity:
  - ``NodeType`` / ``Relation`` are newtype-like strings.
  - ``EdgeType`` is a (src_node_type, relation, dst_node_type) triple.
  - *Condensed* types are dense ``int`` ids assigned to each node/edge type so
    device code can carry types as int32 arrays (ref:
    graph_schema.proto `condensed_node_type_map` / `condensed_edge_type_map`).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Mapping, Optional, Sequence, Tuple, Union

# Type aliases: node/edge types are strings at the API boundary; condensed ids
# (dense ints) are what flows through device code.
NodeType = str
Relation = str
CondensedNodeType = int
CondensedEdgeType = int

DEFAULT_HOMOGENEOUS_NODE_TYPE: NodeType = "default"
DEFAULT_HOMOGENEOUS_RELATION: Relation = "to"


@dataclass(frozen=True, order=True)
class EdgeType:
    """Typed edge triple (src_node_type, relation, dst_node_type).

    Ref parity: `graph_data.py` EdgeType; string form "src-rel-dst" is used in
    YAML configs (the reference uses repeated proto fields).
    """

    src_node_type: NodeType
    relation: Relation
    dst_node_type: NodeType

    def __str__(self) -> str:
        return f"{self.src_node_type}-{self.relation}-{self.dst_node_type}"

    @classmethod
    def from_str(cls, s: str) -> "EdgeType":
        parts = s.split("-")
        if len(parts) != 3:
            raise ValueError(
                f"EdgeType string must be 'src-relation-dst', got {s!r}"
            )
        return cls(parts[0], parts[1], parts[2])

    @property
    def tuple(self) -> Tuple[NodeType, Relation, NodeType]:
        return (self.src_node_type, self.relation, self.dst_node_type)

    def reverse(self) -> "EdgeType":
        return EdgeType(self.dst_node_type, self.relation, self.src_node_type)


DEFAULT_HOMOGENEOUS_EDGE_TYPE = EdgeType(
    DEFAULT_HOMOGENEOUS_NODE_TYPE,
    DEFAULT_HOMOGENEOUS_RELATION,
    DEFAULT_HOMOGENEOUS_NODE_TYPE,
)


def _as_edge_type(e: Union[EdgeType, str, Sequence[str]]) -> EdgeType:
    if isinstance(e, EdgeType):
        return e
    if isinstance(e, str):
        return EdgeType.from_str(e)
    src, rel, dst = e
    return EdgeType(src, rel, dst)


@dataclass(frozen=True)
class GraphMetadata:
    """Schema of the graph: node types, edge types, condensed id maps.

    Ref parity: `graph_schema.proto:44-62` GraphMetadata +
    `config_populator.py:429-505` coherence validation +
    `config_populator.py:507-559` condensed-map population. Condensed maps are
    assigned deterministically (sorted order) when not given, mirroring the
    populator's behavior of filling them into the frozen config.
    """

    node_types: Tuple[NodeType, ...]
    edge_types: Tuple[EdgeType, ...]
    condensed_node_type_map: Mapping[CondensedNodeType, NodeType] = field(
        default_factory=dict
    )
    condensed_edge_type_map: Mapping[CondensedEdgeType, EdgeType] = field(
        default_factory=dict
    )

    def __post_init__(self):
        # Normalize: tuples, canonical EdgeType objects.
        object.__setattr__(self, "node_types", tuple(self.node_types))
        object.__setattr__(
            self, "edge_types", tuple(_as_edge_type(e) for e in self.edge_types)
        )
        if not self.condensed_node_type_map:
            object.__setattr__(
                self,
                "condensed_node_type_map",
                {i: nt for i, nt in enumerate(sorted(self.node_types))},
            )
        if not self.condensed_edge_type_map:
            object.__setattr__(
                self,
                "condensed_edge_type_map",
                {i: et for i, et in enumerate(sorted(self.edge_types))},
            )
        self.validate()

    # -- validation (ref: config_populator.py:429-505) ------------------------
    def validate(self) -> None:
        if len(set(self.node_types)) != len(self.node_types):
            raise ValueError(f"Duplicate node types: {self.node_types}")
        if len(set(self.edge_types)) != len(self.edge_types):
            raise ValueError(f"Duplicate edge types: {self.edge_types}")
        for et in self.edge_types:
            for nt in (et.src_node_type, et.dst_node_type):
                if nt not in self.node_types:
                    raise ValueError(
                        f"Edge type {et} references unknown node type {nt!r}; "
                        f"known: {self.node_types}"
                    )
        cn = self.condensed_node_type_map
        if sorted(cn.keys()) != list(range(len(cn))):
            raise ValueError(f"Condensed node ids must be dense 0..N-1: {cn}")
        if set(cn.values()) != set(self.node_types):
            raise ValueError(
                f"Condensed node map {cn} does not cover node types "
                f"{self.node_types}"
            )
        ce = self.condensed_edge_type_map
        if sorted(ce.keys()) != list(range(len(ce))):
            raise ValueError(f"Condensed edge ids must be dense 0..E-1: {ce}")
        if set(ce.values()) != set(self.edge_types):
            raise ValueError(
                f"Condensed edge map {ce} does not cover edge types "
                f"{self.edge_types}"
            )

    # -- lookups ---------------------------------------------------------------
    @property
    def node_type_to_condensed(self) -> Dict[NodeType, CondensedNodeType]:
        return {v: k for k, v in self.condensed_node_type_map.items()}

    @property
    def edge_type_to_condensed(self) -> Dict[EdgeType, CondensedEdgeType]:
        return {v: k for k, v in self.condensed_edge_type_map.items()}

    @property
    def is_homogeneous(self) -> bool:
        return len(self.node_types) == 1 and len(self.edge_types) == 1

    def condensed_node_types_ordered(self) -> List[NodeType]:
        return [self.condensed_node_type_map[i] for i in range(len(self.node_types))]

    def condensed_edge_types_ordered(self) -> List[EdgeType]:
        return [self.condensed_edge_type_map[i] for i in range(len(self.edge_types))]

    # -- serialization ---------------------------------------------------------
    def to_dict(self) -> dict:
        return {
            "node_types": list(self.node_types),
            "edge_types": [str(e) for e in self.edge_types],
            "condensed_node_type_map": {
                int(k): v for k, v in self.condensed_node_type_map.items()
            },
            "condensed_edge_type_map": {
                int(k): str(v) for k, v in self.condensed_edge_type_map.items()
            },
        }

    @classmethod
    def from_dict(cls, d: Mapping) -> "GraphMetadata":
        return cls(
            node_types=tuple(d["node_types"]),
            edge_types=tuple(_as_edge_type(e) for e in d["edge_types"]),
            condensed_node_type_map={
                int(k): v for k, v in d.get("condensed_node_type_map", {}).items()
            },
            condensed_edge_type_map={
                int(k): _as_edge_type(v)
                for k, v in d.get("condensed_edge_type_map", {}).items()
            },
        )

    @classmethod
    def homogeneous(cls) -> "GraphMetadata":
        return cls(
            node_types=(DEFAULT_HOMOGENEOUS_NODE_TYPE,),
            edge_types=(DEFAULT_HOMOGENEOUS_EDGE_TYPE,),
        )
