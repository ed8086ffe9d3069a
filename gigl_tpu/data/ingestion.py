"""GraphDB ingestion protocol (the SGS GraphDB-variant plugin surface).

Ref parity: `python/gigl/src/subgraph_sampler/lib/ingestion_protocol.py:8-28`
BaseIngestion — the user plugin that loads the preprocessed graph into an
external graph database (NebulaGraph in the reference) before the GraphDB
sampling variant issues k-hop queries against it
(`NebulaHeteroKHopSampler.scala:28-229`).

The TPU framework samples on device, so a graph DB is optional
infrastructure; this protocol exists so deployments that already maintain a
graph DB (e.g. for online serving) can keep their ingestion plugins. A
reference in-memory implementation is provided for tests and as the
template for real backends.
"""

from __future__ import annotations

import abc
from typing import Any, Dict, Iterable, Mapping, Sequence

import numpy as np

from gigl_tpu.types.graph import EdgeType, NodeType


class BaseIngestion(abc.ABC):
    """User plugin: ingest nodes/edges into an external graph store
    (ref ingestion_protocol.py BaseIngestion)."""

    @abc.abstractmethod
    def ingest_nodes(self, node_type: NodeType, node_ids: np.ndarray,
                     features: Mapping[str, np.ndarray]) -> None: ...

    @abc.abstractmethod
    def ingest_edges(self, edge_type: EdgeType, src: np.ndarray,
                     dst: np.ndarray) -> None: ...

    def prepare(self, **kwargs: Any) -> None:
        """Schema/space creation hook (ref: nebula space DDL)."""

    def finalize(self) -> None:
        """Flush/compact hook."""


class InMemoryIngestion(BaseIngestion):
    """Reference implementation: collects the graph in dicts (tests)."""

    def __init__(self):
        self.nodes: Dict[str, Dict[str, np.ndarray]] = {}
        self.edges: Dict[str, np.ndarray] = {}
        self.prepared = False
        self.finalized = False

    def prepare(self, **kwargs):
        self.prepared = True

    def ingest_nodes(self, node_type, node_ids, features):
        self.nodes[str(node_type)] = {
            "ids": np.asarray(node_ids), **{
                k: np.asarray(v) for k, v in features.items()}}

    def ingest_edges(self, edge_type, src, dst):
        self.edges[str(edge_type)] = np.stack(
            [np.asarray(src), np.asarray(dst)])

    def finalize(self):
        self.finalized = True


def ingest_graph(ingestion: BaseIngestion, graph) -> None:
    """Drive a BaseIngestion plugin over a HeteroGraph (the launcher's side
    of the protocol, ref subgraph_sampler.py GraphDB task setup)."""
    ingestion.prepare()
    for nt in graph.metadata.node_types:
        n = graph.num_nodes[nt]
        feats = {}
        if nt in graph.node_features:
            feats["features"] = graph.node_features[nt]
        if nt in graph.node_labels:
            feats["labels"] = graph.node_labels[nt]
        ingestion.ingest_nodes(nt, np.arange(n), feats)
    for et, coo in graph.edges.items():
        ingestion.ingest_edges(et, coo[0], coo[1])
    ingestion.finalize()
