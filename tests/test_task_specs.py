"""Task-spec tests: config-driven end-to-end train/eval/infer (the e2e slice
of SURVEY.md §7.3, CPU-sized)."""

import numpy as np
import pytest

from gigl_tpu.config.task_config import (
    DatasetConfig,
    SubgraphSamplingStrategy,
    TaskConfig,
    TrainerConfig,
)
from gigl_tpu.training.task_specs import (
    NodeAnchorLinkPredictionTaskSpec,
    NodeClassificationTaskSpec,
)
from gigl_tpu.types.graph import GraphMetadata
from gigl_tpu.types.task import TaskMetadata, TaskMetadataType
from gigl_tpu.utils.registry import import_obj

from tests.test_training import _clustered_graph


def _nalp_config(**trainer_args):
    gm = GraphMetadata.homogeneous()
    return TaskConfig(
        graph_metadata=gm,
        task_metadata=TaskMetadata(
            task_type=TaskMetadataType.NODE_ANCHOR_BASED_LINK_PREDICTION_TASK,
            supervision_edge_types=gm.edge_types,
        ),
        dataset=DatasetConfig(
            sampling=SubgraphSamplingStrategy(fanouts=(5, 3))),
        trainer=TrainerConfig(trainer_args={
            "hid_dim": "16", "out_dim": "16", "num_layers": "2",
            "main_sample_batch_size": "32",
            "random_negative_batch_size": "64",
            "learning_rate": "0.01",
            **trainer_args,
        }),
    )


class TestNALPTaskSpec:
    def test_end_to_end_train_eval_infer(self, tmp_path):
        g, _, _, _ = _clustered_graph()
        cfg = _nalp_config(num_epochs="4", val_every_num_batches="4",
                           num_val_batches="2")
        spec = NodeAnchorLinkPredictionTaskSpec()
        spec.init_model(cfg, graph=g)
        metrics = spec.train()
        assert metrics["mrr"] > 0.3, metrics
        test_metrics = spec.eval("test", num_batches=2)
        assert "mrr" in test_metrics
        emb = spec.infer_batch(np.arange(8))
        assert emb.shape == (8, 16)
        spec.save(str(tmp_path / "model"), step=1)
        assert (tmp_path / "model" / "step_1").exists()

    def test_ssl_positive_selection(self):
        g, _, _, _ = _clustered_graph()
        cfg = _nalp_config(ssl_positive_ratio="0.3", num_epochs="1")
        spec = NodeAnchorLinkPredictionTaskSpec()
        spec.init_model(cfg, graph=g)
        # SSL subset => fewer anchors than with all edges.
        cfg_full = _nalp_config(num_epochs="1")
        spec_full = NodeAnchorLinkPredictionTaskSpec()
        spec_full.init_model(cfg_full, graph=g)
        n_ssl = sum(len(s) for s in spec.splits)
        n_full = sum(len(s) for s in spec_full.splits)
        assert n_ssl <= n_full

    def test_warm_start(self, tmp_path):
        g, _, _, _ = _clustered_graph()
        cfg = _nalp_config(num_epochs="1")
        spec = NodeAnchorLinkPredictionTaskSpec()
        spec.init_model(cfg, graph=g)
        spec.save(str(tmp_path / "warm"), step=0)
        cfg2 = _nalp_config(num_epochs="1")
        cfg2.trainer.pretrained_model_uri = str(tmp_path / "warm")
        spec2 = NodeAnchorLinkPredictionTaskSpec()
        params = spec2.init_model(cfg2, graph=g)
        import jax
        a = jax.tree_util.tree_leaves(spec.state.params)
        b = jax.tree_util.tree_leaves(params)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    def test_requires_graph(self):
        spec = NodeAnchorLinkPredictionTaskSpec()
        with pytest.raises(ValueError, match="graph"):
            spec.init_model(_nalp_config())

    def test_default_cls_path_importable(self):
        cls = import_obj(
            "gigl_tpu.training.task_specs.NodeAnchorLinkPredictionTaskSpec")
        assert cls is NodeAnchorLinkPredictionTaskSpec


class TestNodeClassificationTaskSpec:
    def test_end_to_end(self):
        g, _, _, cluster = _clustered_graph(
            num_clusters=4, nodes_per_cluster=32, intra_edges=300)
        gm = GraphMetadata.homogeneous()
        cfg = TaskConfig(
            graph_metadata=gm,
            task_metadata=TaskMetadata(
                task_type=TaskMetadataType.NODE_BASED_TASK,
                supervision_node_types=gm.node_types),
            trainer=TrainerConfig(trainer_args={
                "hid_dim": "16", "num_layers": "2", "fanouts": "5,3",
                "main_sample_batch_size": "32", "learning_rate": "0.01",
                "num_epochs": "6",
            }),
        )
        spec = NodeClassificationTaskSpec()
        spec.init_model(cfg, graph=g)
        metrics = spec.train()
        assert metrics["accuracy"] > 0.5, metrics
        logits = spec.infer_batch(np.arange(4))
        assert logits.shape == (4, 4)
