"""Mocked dataset assets for tests and examples.

Ref parity: `python/gigl/src/mocking/` DatasetAssetMockingSuite
(dataset_asset_mocking_suite.py:31) — generates toy/Cora/DBLP datasets and
every pipeline stage's artifacts so each layer is testable in isolation
(SURVEY.md §4 "Mocked pipeline artifacts"). Named handles mirror
mocking_assets/mocked_datasets_for_pipeline_tests.py:3-25.

TPU-native version: deterministic synthetic graphs (no downloads) + a
builder that runs the real pipeline stages over them to produce artifacts.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import numpy as np

from gigl_tpu.config.task_config import (
    DatasetConfig,
    SubgraphSamplingStrategy,
    TaskConfig,
    TrainerConfig,
)
from gigl_tpu.data.preprocessor import (
    DataPreprocessorConfig,
    EdgeDataSource,
    NodeDataSource,
)
from gigl_tpu.graph.csr import HeteroGraph
from gigl_tpu.types.graph import (
    DEFAULT_HOMOGENEOUS_EDGE_TYPE,
    DEFAULT_HOMOGENEOUS_NODE_TYPE,
    EdgeType,
    GraphMetadata,
)
from gigl_tpu.types.task import TaskMetadata, TaskMetadataType

# Named dataset handles (ref mocked_datasets_for_pipeline_tests.py:3-25).
TOY_GRAPH_NODE_ANCHOR_LP = "toy_graph_node_anchor_lp"
CORA_NODE_CLASSIFICATION = "cora_node_classification"
CORA_NODE_ANCHOR_LP = "cora_node_anchor_lp"
BIPARTITE_TOY_GRAPH_LP = "bipartite_toy_graph_lp"
HETEROGENEOUS_TOY_GRAPH = "heterogeneous_toy_graph"


def toy_graph(num_clusters=32, nodes_per_cluster=4, intra_edges=30, dim=8,
              seed=0) -> HeteroGraph:
    """Planted-cluster homogeneous graph: learnable link prediction and
    node classification (cluster = label)."""
    rng = np.random.default_rng(seed)
    N = num_clusters * nodes_per_cluster
    cluster = np.arange(N) // nodes_per_cluster
    centers = rng.normal(size=(num_clusters, dim)) * 3
    x = (centers[cluster] + rng.normal(size=(N, dim)) * 0.3).astype(np.float32)
    srcs, dsts = [], []
    for c in range(num_clusters):
        members = np.where(cluster == c)[0]
        srcs.append(rng.choice(members, intra_edges))
        dsts.append(rng.choice(members, intra_edges))
    return HeteroGraph.homogeneous(
        src=np.concatenate(srcs), dst=np.concatenate(dsts), num_nodes=N,
        node_features=x, node_labels=cluster, make_undirected=True)


def cora_like(num_nodes=708, num_classes=7, dim=64, avg_degree=8,
              homophily=0.9, seed=1, label_noise=0.0) -> HeteroGraph:
    """Cora-shaped synthetic citation graph: sparse features correlated with
    class, homophilous edges (the pipeline-test workhorse; the reference
    mocks real Cora, mocking_assets/toy_graph_data.yaml).

    ``label_noise``: fraction of OBSERVED labels re-drawn uniformly after
    features/edges are built from the true labels — caps attainable
    accuracy below 1.0 (~1 - noise*(1-1/C)) so accuracy milestones stay
    sensitive to regressions instead of saturating at the ceiling."""
    rng = np.random.default_rng(seed)
    labels = rng.integers(0, num_classes, num_nodes)
    protos = rng.random((num_classes, dim)) < 0.3
    x = np.zeros((num_nodes, dim), np.float32)
    for i in range(num_nodes):
        keep = rng.random(dim) < 0.7
        x[i] = protos[labels[i]] * keep + (rng.random(dim) < 0.05)
    x = np.minimum(x, 1.0)
    E = num_nodes * avg_degree // 2
    src = rng.integers(0, num_nodes, E)
    same = rng.random(E) < homophily
    dst = np.empty(E, np.int64)
    for c in range(num_classes):
        members = np.where(labels == c)[0]
        m = same & (labels[src] == c)
        dst[m] = rng.choice(members, int(m.sum()))
    dst[~same] = rng.integers(0, num_nodes, int((~same).sum()))
    if label_noise > 0.0:
        flip = rng.random(num_nodes) < label_noise
        labels = labels.copy()
        labels[flip] = rng.integers(0, num_classes, int(flip.sum()))
    return HeteroGraph.homogeneous(
        src=src, dst=dst, num_nodes=num_nodes, node_features=x,
        node_labels=labels, make_undirected=True)


def bipartite_toy_graph(num_users=64, num_items=48, dim=8, edges_per_user=6,
                        seed=2) -> HeteroGraph:
    """user-buys-item bipartite graph with reverse edges (ref 'toy graph'
    bipartite mock)."""
    rng = np.random.default_rng(seed)
    gm = GraphMetadata(
        node_types=("user", "item"),
        edge_types=(EdgeType("user", "buys", "item"),
                    EdgeType("item", "rev_buys", "user")))
    # Co-cluster structure: user u prefers item cluster u % 4.
    item_cluster = np.arange(num_items) % 4
    src, dst = [], []
    for u in range(num_users):
        pref = np.where(item_cluster == u % 4)[0]
        picks = rng.choice(pref, edges_per_user)
        src.extend([u] * edges_per_user)
        dst.extend(picks.tolist())
    src, dst = np.array(src), np.array(dst)
    g = HeteroGraph(
        metadata=gm,
        num_nodes={"user": num_users, "item": num_items},
        edges={
            EdgeType("user", "buys", "item"): np.stack([src, dst]),
            EdgeType("item", "rev_buys", "user"): np.stack([dst, src]),
        })
    g.node_features["user"] = rng.normal(
        size=(num_users, dim)).astype(np.float32)
    g.node_features["item"] = np.concatenate(
        [np.eye(4, dtype=np.float32)[item_cluster],
         rng.normal(size=(num_items, dim - 4)).astype(np.float32)], axis=1)
    return g


def heterogeneous_toy_graph(num_authors=60, num_papers=90, dim=8, seed=3
                            ) -> HeteroGraph:
    """DBLP-shaped author/paper graph (ref DBLP mock analog)."""
    rng = np.random.default_rng(seed)
    gm = GraphMetadata(
        node_types=("author", "paper"),
        edge_types=(EdgeType("author", "writes", "paper"),
                    EdgeType("paper", "rev_writes", "author"),
                    EdgeType("paper", "cites", "paper")))
    a = rng.integers(0, num_authors, num_papers * 2)
    p = rng.integers(0, num_papers, num_papers * 2)
    c_src = rng.integers(0, num_papers, num_papers * 3)
    c_dst = rng.integers(0, num_papers, num_papers * 3)
    g = HeteroGraph(
        metadata=gm,
        num_nodes={"author": num_authors, "paper": num_papers},
        edges={
            EdgeType("author", "writes", "paper"): np.stack([a, p]),
            EdgeType("paper", "rev_writes", "author"): np.stack([p, a]),
            EdgeType("paper", "cites", "paper"): np.stack([c_src, c_dst]),
        })
    g.node_features["author"] = rng.normal(
        size=(num_authors, dim)).astype(np.float32)
    g.node_features["paper"] = rng.normal(
        size=(num_papers, dim)).astype(np.float32)
    g.node_labels["paper"] = rng.integers(0, 4, num_papers)
    return g


class MockedPreprocessorConfig(DataPreprocessorConfig):
    """Wraps any HeteroGraph as raw pipeline sources (re-deriving raw ids so
    enumeration is exercised)."""

    def __init__(self, graph: HeteroGraph, id_offset: int = 1000):
        self.graph = graph
        self.id_offset = id_offset  # raw id = dense id + offset (per type)

    def node_sources(self):
        out = []
        for nt in self.graph.metadata.node_types:
            n = self.graph.num_nodes[nt]
            feats = (self.graph.node_features[nt]
                     if nt in self.graph.node_features
                     else np.zeros((n, 1), np.float32))
            labels = self.graph.node_labels.get(nt)
            cols = {f"f{i}": feats[:, i] for i in range(feats.shape[1])}
            out.append(NodeDataSource.from_arrays(
                nt, np.arange(n) + self.id_offset, cols, labels=labels))
        return out

    def edge_sources(self):
        out = []
        for et, coo in self.graph.edges.items():
            out.append(EdgeDataSource.from_arrays(
                et, coo[0] + self.id_offset, coo[1] + self.id_offset))
        return out


_BUILDERS = {
    TOY_GRAPH_NODE_ANCHOR_LP: toy_graph,
    CORA_NODE_CLASSIFICATION: cora_like,
    CORA_NODE_ANCHOR_LP: cora_like,
    BIPARTITE_TOY_GRAPH_LP: bipartite_toy_graph,
    HETEROGENEOUS_TOY_GRAPH: heterogeneous_toy_graph,
}


def get_mocked_graph(name: str) -> HeteroGraph:
    """Ref parity: get_mocked_dataset_artifact_metadata() lookup by handle."""
    if name not in _BUILDERS:
        raise KeyError(f"Unknown mocked dataset {name!r}; "
                       f"known: {sorted(_BUILDERS)}")
    return _BUILDERS[name]()


def mocked_task_config(name: str, **trainer_args) -> TaskConfig:
    """Template TaskConfig matched to a mocked dataset."""
    g = get_mocked_graph(name)
    defaults = {"hid_dim": "32", "out_dim": "32", "num_layers": "2",
                "main_sample_batch_size": "64",
                "random_negative_batch_size": "64",
                "learning_rate": "0.01", "num_epochs": "4"}
    defaults.update({k: str(v) for k, v in trainer_args.items()})
    if name == CORA_NODE_CLASSIFICATION:
        tm = TaskMetadata(task_type=TaskMetadataType.NODE_BASED_TASK,
                          supervision_node_types=g.metadata.node_types)
        cls_path = "gigl_tpu.training.task_specs.NodeClassificationTaskSpec"
    else:
        sup = (g.metadata.edge_types[:1])
        tm = TaskMetadata(
            task_type=TaskMetadataType.NODE_ANCHOR_BASED_LINK_PREDICTION_TASK,
            supervision_edge_types=sup)
        cls_path = ("gigl_tpu.training.task_specs."
                    "NodeAnchorLinkPredictionTaskSpec")
    return TaskConfig(
        graph_metadata=g.metadata,
        task_metadata=tm,
        dataset=DatasetConfig(
            sampling=SubgraphSamplingStrategy(fanouts=(5, 3))),
        trainer=TrainerConfig(trainer_cls_path=cls_path,
                              trainer_args=defaults),
    )
