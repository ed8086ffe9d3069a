"""Graph containers: per-edge-type CSR adjacency + typed feature stores.

TPU-native replacement for the reference's GLT graph store
(ref: python/gigl/distributed/dist_link_prediction_dataset.py:439 `init_graph`
builds a GLT CSR topology per edge type; feature stores live alongside).
Design differences from the reference:

  - Host-side build is pure NumPy (no C++ graph store needed for the
    in-memory path); device code receives jnp arrays with **static shapes**.
  - Adjacency is stored keyed by *anchor* node with neighbor lists sorted,
    so both sampling directions are just two CSR builds (ref `edge_dir`
    in/out, dist_link_prediction_dataset.py).
  - Indices are int32 (sufficient per shard), indptr int64.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, Mapping, Optional, Tuple, Union

import numpy as np

from gigl_tpu.types.graph import (
    DEFAULT_HOMOGENEOUS_EDGE_TYPE,
    DEFAULT_HOMOGENEOUS_NODE_TYPE,
    EdgeType,
    GraphMetadata,
    NodeType,
)


@dataclass
class CSR:
    """Compressed sparse adjacency for one edge type, keyed by anchor node.

    ``indptr[v]:indptr[v+1]`` slices ``indices`` to the neighbor ids of
    anchor node ``v``. ``edge_ids`` maps each adjacency slot back to the
    original COO edge row (for edge-feature lookup), or is None.
    """

    indptr: np.ndarray  # [num_anchor_nodes + 1], int64
    indices: np.ndarray  # [num_edges], int32 neighbor node ids
    edge_ids: Optional[np.ndarray] = None  # [num_edges], int64 original edge row
    num_neighbor_nodes: int = 0  # size of the neighbor-side id space

    @property
    def num_anchor_nodes(self) -> int:
        return len(self.indptr) - 1

    @property
    def num_edges(self) -> int:
        return len(self.indices)

    def degrees(self) -> np.ndarray:
        return np.diff(self.indptr)

    def neighbors(self, v: int) -> np.ndarray:
        return self.indices[self.indptr[v]: self.indptr[v + 1]]


def build_csr(
    src: np.ndarray,
    dst: np.ndarray,
    *,
    num_anchor_nodes: Optional[int] = None,
    num_neighbor_nodes: Optional[int] = None,
    anchor: str = "dst",
) -> CSR:
    """Build CSR keyed on ``anchor`` ("dst" → in-edges per node, i.e. the
    INCOMING sampling layout; "src" → out-edges, OUTGOING layout).

    Deterministic: neighbor lists are ordered by (anchor, original edge
    order) via stable sort, so sampled permutations are reproducible.
    """
    src = np.asarray(src)
    dst = np.asarray(dst)
    if src.shape != dst.shape or src.ndim != 1:
        raise ValueError(f"src/dst must be 1-D same-shape, got {src.shape}/{dst.shape}")
    key, nbr = (dst, src) if anchor == "dst" else (src, dst)
    n_anchor = int(num_anchor_nodes if num_anchor_nodes is not None
                   else (key.max() + 1 if len(key) else 0))
    n_nbr = int(num_neighbor_nodes if num_neighbor_nodes is not None
                else (nbr.max() + 1 if len(nbr) else 0))
    if len(key) and key.max() >= n_anchor:
        raise ValueError(
            f"anchor id {key.max()} >= num_anchor_nodes {n_anchor}"
        )
    order = np.argsort(key, kind="stable")
    counts = np.bincount(key, minlength=n_anchor)
    indptr = np.zeros(n_anchor + 1, dtype=np.int64)
    np.cumsum(counts, out=indptr[1:])
    return CSR(
        indptr=indptr,
        indices=nbr[order].astype(np.int32),
        edge_ids=order.astype(np.int64),
        num_neighbor_nodes=n_nbr,
    )


@dataclass
class FeatureStore:
    """Per-node-type (or per-edge-type) dense feature matrices.

    Ref parity: GLT Feature stores built in
    dist_link_prediction_dataset.py:428-436; here a plain dict of
    [N, D] float arrays (host NumPy; moved to device lazily).
    """

    features: Dict[str, np.ndarray] = field(default_factory=dict)

    def dim(self, key: str) -> int:
        return int(self.features[key].shape[-1]) if key in self.features else 0

    def __contains__(self, key: str) -> bool:
        return key in self.features

    def __getitem__(self, key: str) -> np.ndarray:
        return self.features[key]

    def __setitem__(self, key: str, value: np.ndarray) -> None:
        self.features[key] = np.asarray(value)


@dataclass
class HeteroGraph:
    """In-memory typed graph: CSRs per (edge type, direction) + features.

    The single container flowing through sampling, training, and inference —
    the TPU-side analog of the reference's DistLinkPredictionDataset
    (dist_link_prediction_dataset.py:31) minus the RPC machinery (replaced by
    sharding, see gigl_tpu.graph.partition).
    """

    metadata: GraphMetadata
    num_nodes: Dict[NodeType, int]
    # COO edge lists per edge type (kept for splitting / label selection).
    edges: Dict[EdgeType, np.ndarray]  # [2, E] int (src row 0, dst row 1)
    node_features: FeatureStore = field(default_factory=FeatureStore)
    edge_features: FeatureStore = field(default_factory=FeatureStore)
    node_labels: Dict[NodeType, np.ndarray] = field(default_factory=dict)
    # Lazily-built CSRs keyed by (edge_type, anchor).
    _csr_cache: Dict[Tuple[EdgeType, str], CSR] = field(default_factory=dict)

    def __post_init__(self):
        for et, coo in self.edges.items():
            coo = np.asarray(coo)
            if coo.ndim != 2 or coo.shape[0] != 2:
                raise ValueError(f"edges[{et}] must be [2, E], got {coo.shape}")
            self.edges[et] = coo
            if et not in self.metadata.edge_types:
                raise ValueError(f"edge type {et} not in metadata")
        for nt in self.metadata.node_types:
            if nt not in self.num_nodes:
                raise ValueError(f"num_nodes missing for node type {nt!r}")

    # -- CSR access ------------------------------------------------------------
    def csr(self, edge_type: EdgeType, anchor: str = "dst") -> CSR:
        key = (edge_type, anchor)
        if key not in self._csr_cache:
            coo = self.edges[edge_type]
            self._csr_cache[key] = build_csr(
                coo[0],
                coo[1],
                num_anchor_nodes=self.num_nodes[
                    edge_type.dst_node_type if anchor == "dst"
                    else edge_type.src_node_type
                ],
                num_neighbor_nodes=self.num_nodes[
                    edge_type.src_node_type if anchor == "dst"
                    else edge_type.dst_node_type
                ],
                anchor=anchor,
            )
        return self._csr_cache[key]

    @property
    def num_total_edges(self) -> int:
        return sum(e.shape[1] for e in self.edges.values())

    # -- homogeneous conveniences ---------------------------------------------
    @classmethod
    def homogeneous(
        cls,
        src: np.ndarray,
        dst: np.ndarray,
        *,
        num_nodes: int,
        node_features: Optional[np.ndarray] = None,
        edge_features: Optional[np.ndarray] = None,
        node_labels: Optional[np.ndarray] = None,
        make_undirected: bool = False,
    ) -> "HeteroGraph":
        """Build a homogeneous graph with the default node/edge type.

        ``make_undirected`` adds reversed edges (ref SGS
        `enforceBidirectionalization`, SGSPureSparkV1Task.scala:218 — the
        reference bidirectionalizes when graphs are undirected).
        """
        src = np.asarray(src, dtype=np.int64)
        dst = np.asarray(dst, dtype=np.int64)
        ef = edge_features
        if make_undirected:
            src, dst = np.concatenate([src, dst]), np.concatenate([dst, src])
            if ef is not None:
                ef = np.concatenate([ef, ef], axis=0)
        g = cls(
            metadata=GraphMetadata.homogeneous(),
            num_nodes={DEFAULT_HOMOGENEOUS_NODE_TYPE: int(num_nodes)},
            edges={DEFAULT_HOMOGENEOUS_EDGE_TYPE: np.stack([src, dst])},
        )
        if node_features is not None:
            g.node_features[DEFAULT_HOMOGENEOUS_NODE_TYPE] = node_features
        if ef is not None:
            g.edge_features[str(DEFAULT_HOMOGENEOUS_EDGE_TYPE)] = ef
        if node_labels is not None:
            g.node_labels[DEFAULT_HOMOGENEOUS_NODE_TYPE] = np.asarray(node_labels)
        return g

    @property
    def default_edges(self) -> np.ndarray:
        return self.edges[DEFAULT_HOMOGENEOUS_EDGE_TYPE]
