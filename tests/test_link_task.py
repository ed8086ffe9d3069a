"""Link-based task (edge classification) tests.

The reference defines the task schema (LinkBasedTaskMetadata,
SupervisedLinkBasedTaskSample) but ships no trainer; link_task.py completes
it. Tests: learnability on a structured problem, logits surface, and the
GBML sample-import contract.
"""

import numpy as np

import jax
import jax.numpy as jnp

from gigl_tpu.graph.csr import HeteroGraph
from gigl_tpu.models.encoders import GNNEncoder
from gigl_tpu.training.dataset import DeviceGraph
from gigl_tpu.training.link_task import (
    EdgeClassifierHead,
    LinkClassificationModel,
    LinkClassificationTrainer,
    LinkClassificationTrainerConfig,
)


def _edge_labeled_graph(n=240, num_clusters=12, dim=8, seed=0):
    """Edges labeled 1 iff endpoints share a cluster — learnable from
    cluster-correlated features."""
    rng = np.random.default_rng(seed)
    cluster = np.arange(n) // (n // num_clusters)
    centers = rng.normal(size=(num_clusters, dim)) * 3
    x = (centers[cluster] + 0.3 * rng.normal(size=(n, dim))).astype(np.float32)
    # structural edges: intra-cluster
    srcs, dsts = [], []
    for c in range(num_clusters):
        m = np.where(cluster == c)[0]
        srcs.append(rng.choice(m, 60))
        dsts.append(rng.choice(m, 60))
    src, dst = np.concatenate(srcs), np.concatenate(dsts)
    g = HeteroGraph.homogeneous(src=src, dst=dst, num_nodes=n,
                                node_features=x, make_undirected=True)
    # labeled edges: half intra (label 1), half inter (label 0)
    e_src = rng.integers(0, n, 600)
    e_dst = rng.integers(0, n, 600)
    labels = (cluster[e_src] == cluster[e_dst]).astype(np.int64)
    return g, np.stack([e_src, e_dst]), labels


def _make_trainer():
    g, edges, labels = _edge_labeled_graph()
    dg = DeviceGraph.from_hetero(g)
    model = LinkClassificationModel(
        encoder=GNNEncoder(hid_dim=16, out_dim=16, num_layers=2,
                           conv="graphsage"),
        head=EdgeClassifierHead(num_classes=2, hidden_dim=16,
                                combine="concat"))
    tr = LinkClassificationTrainer(
        model, dg, edges, labels,
        LinkClassificationTrainerConfig(fanouts=(5, 3)),
        optimizer_args={"learning_rate": "0.01"})
    return tr, edges, labels


class TestLinkClassification:
    def test_learns_edge_labels(self):
        tr, edges, labels = _make_trainer()
        idx = np.arange(edges.shape[1])
        rng_np = np.random.default_rng(0)
        rng_np.shuffle(idx)
        train, val = idx[:480], idx[480:]
        state = tr.init_state(jax.random.PRNGKey(0), batch_size=64)
        state, metrics = tr.fit(state, train, val, batch_size=64,
                                num_epochs=8, log_every=0)
        assert metrics["accuracy"] > 0.8, metrics

    def test_predict_batch_logits(self):
        tr, edges, labels = _make_trainer()
        state = tr.init_state(jax.random.PRNGKey(0), batch_size=8)
        logits = tr.predict_batch(state.params, edges[0, :8], edges[1, :8])
        assert logits.shape == (8, 2)
        assert np.isfinite(np.asarray(logits)).all()

    def test_hadamard_combine(self):
        g, edges, labels = _edge_labeled_graph()
        dg = DeviceGraph.from_hetero(g)
        model = LinkClassificationModel(
            encoder=GNNEncoder(hid_dim=8, out_dim=8, num_layers=1,
                               conv="graphsage"),
            head=EdgeClassifierHead(num_classes=2, combine="hadamard"))
        tr = LinkClassificationTrainer(
            model, dg, edges, labels,
            LinkClassificationTrainerConfig(fanouts=(3,)))
        state = tr.init_state(jax.random.PRNGKey(0), batch_size=16)
        state, loss = tr.train_step(state, np.arange(16),
                                    jax.random.PRNGKey(1))
        assert np.isfinite(float(loss))


class TestLinkSampleImport:
    def test_link_supervision_from_samples(self):
        from gigl_tpu.data import gbml

        samples = [
            gbml.SupervisedLinkBasedTaskSamplePb(
                root_edge=gbml.GbmlEdge(1, 2, condensed_edge_type=0),
                root_edge_labels=[gbml.GbmlLabel("viewed", 1)]),
            gbml.SupervisedLinkBasedTaskSamplePb(
                root_edge=gbml.GbmlEdge(3, 4, condensed_edge_type=0)),
        ]
        sup = gbml.link_supervision_from_samples(samples)
        et = next(iter(sup))
        np.testing.assert_array_equal(sup[et]["edges"],
                                      [[1, 3], [2, 4]])
        np.testing.assert_array_equal(sup[et]["labels"], [1, -1])


class TestLinkBasedTaskSpec:
    def _config(self, **trainer_args):
        from gigl_tpu.config.task_config import (
            DatasetConfig,
            SubgraphSamplingStrategy,
            TaskConfig,
            TrainerConfig,
        )
        from gigl_tpu.types.graph import GraphMetadata
        from gigl_tpu.types.task import TaskMetadata, TaskMetadataType

        gm = GraphMetadata.homogeneous()
        return TaskConfig(
            graph_metadata=gm,
            task_metadata=TaskMetadata(
                task_type=TaskMetadataType.LINK_BASED_TASK,
                supervision_edge_types=gm.edge_types),
            dataset=DatasetConfig(
                sampling=SubgraphSamplingStrategy(fanouts=(5, 3))),
            trainer=TrainerConfig(
                trainer_cls_path="gigl_tpu.training.task_specs."
                                 "LinkBasedTaskSpec",
                trainer_args={"hid_dim": "16", "out_dim": "16",
                              "num_layers": "2", "learning_rate": "0.01",
                              "main_sample_batch_size": "64",
                              "edge_combine": "concat",
                              **trainer_args}),
        )

    def test_spec_end_to_end(self):
        from gigl_tpu.training.task_specs import LinkBasedTaskSpec

        g, edges, labels = _edge_labeled_graph()
        cfg = self._config(num_epochs="8")
        spec = LinkBasedTaskSpec()
        spec.init_model(cfg, graph=g, labeled_edges=edges,
                        edge_labels=labels)
        metrics = spec.train()
        assert metrics["accuracy"] > 0.75, metrics
        test_m = spec.eval("test")
        assert test_m["accuracy"] > 0.6, test_m
        logits = spec.infer_batch(edges[:, :5])
        assert logits.shape == (5, 2)

    def test_labels_from_edge_feature_column(self):
        from gigl_tpu.training.task_specs import LinkBasedTaskSpec

        g, edges, labels = _edge_labeled_graph()
        # attach labels as an edge-feature column on the structural edges
        et = g.metadata.edge_types[0]
        coo = g.edges[et]
        import numpy as _np
        lbl = _np.random.default_rng(0).integers(
            0, 2, coo.shape[1]).astype(_np.float32)
        g.edge_features[str(et)] = lbl[:, None]
        cfg = self._config(num_epochs="1", edge_label_feature_index="0")
        spec = LinkBasedTaskSpec()
        spec.init_model(cfg, graph=g)
        m = spec.train()
        assert _np.isfinite(m["accuracy"])

    def test_missing_labels_rejected(self):
        import pytest as _pytest

        from gigl_tpu.training.task_specs import LinkBasedTaskSpec

        g, _, _ = _edge_labeled_graph()
        spec = LinkBasedTaskSpec()
        with _pytest.raises(ValueError, match="edge_labels"):
            spec.init_model(self._config(), graph=g)
