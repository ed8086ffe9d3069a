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


class TestUDLEdgeSplitStrategy:
    """UDL semantics: user supervision edges hash-split into per-split
    SUPERVISION sets; full structural graph stays the message graph
    (ref UserDefinedLabelsNodeAnchorBasedLinkPredictionSplitStrategy)."""

    @pytest.mark.slow
    def test_end_to_end(self):
        g, _, _, _ = _clustered_graph()
        cfg = _nalp_config(num_epochs="3", val_every_num_batches="4",
                           num_val_batches="2", split_strategy="udl_edge")
        spec = NodeAnchorLinkPredictionTaskSpec()
        spec.init_model(cfg, graph=g)
        # Per-split graphs share the message CSR but hold disjoint
        # supervision edges.
        assert spec._split_graphs is not None
        tr, va, te = spec._split_graphs
        assert tr.message_csr is va.message_csr is te.message_csr
        n_sup = (tr.supervision_csr.indices.shape[0]
                 + va.supervision_csr.indices.shape[0]
                 + te.supervision_csr.indices.shape[0])
        assert n_sup == g.default_edges.shape[1]
        metrics = spec.train()
        assert metrics["mrr"] > 0.2, metrics
        test_metrics = spec.eval("test", num_batches=2)
        assert "mrr" in test_metrics
        # eval() restores the fit()-time default (VAL graph) afterwards.
        assert spec.trainer.eval_graph is va

    def test_splits_follow_edge_assignment(self):
        from gigl_tpu.graph.splitters import UserDefinedLabelsEdgeSplitter

        g, src, dst, _ = _clustered_graph()
        cfg = _nalp_config(split_strategy="udl_edge")
        spec = NodeAnchorLinkPredictionTaskSpec()
        spec.init_model(cfg, graph=g)
        coo = g.default_edges
        sp = cfg.dataset.split
        udl = UserDefinedLabelsEdgeSplitter(
            train_ratio=sp.train_ratio, val_ratio=sp.val_ratio, seed=sp.seed)
        tr_idx, va_idx, te_idx = udl.split_edge_indices(coo[0], coo[1])
        np.testing.assert_array_equal(
            spec.splits[1], np.unique(coo[1, va_idx]))


class TestInductiveNodeClassification:
    def test_end_to_end_with_disjoint_graphs(self):
        g, _, _, _ = _clustered_graph(
            num_clusters=4, nodes_per_cluster=48, intra_edges=600)
        gm = GraphMetadata.homogeneous()
        cfg = TaskConfig(
            graph_metadata=gm,
            task_metadata=TaskMetadata(
                task_type=TaskMetadataType.NODE_BASED_TASK,
                supervision_node_types=gm.node_types),
            trainer=TrainerConfig(trainer_args={
                "hid_dim": "16", "num_layers": "2", "fanouts": "5,3",
                "main_sample_batch_size": "32", "learning_rate": "0.01",
                "num_epochs": "6", "split_strategy": "inductive_node",
            }),
        )
        spec = NodeClassificationTaskSpec()
        spec.init_model(cfg, graph=g)
        # Disjoint graphs: each split's edge count < full graph, and they
        # partition the same-split edges.
        full_edges = g.default_edges.shape[1]
        per_split = [int(dg.message_csr.indices.shape[0])
                     for dg in spec._split_graphs]
        assert sum(per_split) <= full_edges
        assert all(0 < e < full_edges for e in per_split)
        metrics = spec.train()
        assert metrics["accuracy"] > 0.5, metrics
        acc = spec.eval("test")
        assert acc["accuracy"] > 0.5, acc

    def test_transductive_node_strategy(self):
        g, _, _, _ = _clustered_graph(
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
                "num_epochs": "4", "split_strategy": "transductive_node",
            }),
        )
        spec = NodeClassificationTaskSpec()
        spec.init_model(cfg, graph=g)
        # Single shared graph (transductive), ratio-bucketed node splits.
        assert spec._split_graphs is None
        n = sum(len(s) for s in spec.splits)
        assert n == g.num_nodes[gm.node_types[0]]
        metrics = spec.train()
        assert metrics["accuracy"] > 0.5, metrics


class TestRootNodeDownsampling:
    def test_caps_train_anchor_count(self):
        g, _, _, _ = _clustered_graph()
        cfg = _nalp_config(num_max_training_samples="40")
        spec = NodeAnchorLinkPredictionTaskSpec()
        spec.init_model(cfg, graph=g)
        assert len(spec.splits[0]) == 40
        # val/test untouched.
        assert len(spec.splits[1]) > 0


class TestPerfKnobArgs:
    @pytest.mark.slow
    def test_tabularized_knobs_via_trainer_args(self):
        """cached_hop / fused_cache / use_bf16 are config-surface knobs
        (docs/performance.md) reachable from the flat trainerArgs map."""
        g, _, _, _ = _clustered_graph()
        cfg = _nalp_config(num_epochs="1", cached_hop="true",
                           fused_cache="true", use_bf16="true")
        spec = NodeAnchorLinkPredictionTaskSpec()
        spec.init_model(cfg, graph=g)
        assert spec.trainer.cfg.cached_hop is True
        assert spec.trainer.cfg.fused_cache is True
        assert spec.trainer.graph.nbr_cache is not None
        assert spec.trainer.graph.fused_table is not None
        import jax.numpy as jnp
        assert spec.trainer.model.encoder.dtype == jnp.bfloat16
        metrics = spec.train()
        assert np.isfinite(metrics["mrr"])


class TestPartitionedBackendDispatch:
    """trainerArgs partitioned_backend=true — the should_run_glt_backend
    dispatch analog (ref pb_wrappers/gbml_config.py:416-429): the same task
    spec trains on the partitioned-graph backend (training/dist_sampled.py)."""

    @pytest.mark.slow
    def test_spec_trains_on_partitioned_backend(self):
        from gigl_tpu.training.dist_sampled import PartitionedNALPTrainer

        g, _, _, _ = _clustered_graph()
        cfg = _nalp_config(num_epochs="3", val_every_num_batches="4",
                           num_val_batches="2", partitioned_backend="true",
                           capacity_factor="8.0")
        spec = NodeAnchorLinkPredictionTaskSpec()
        spec.init_model(cfg, graph=g)
        assert isinstance(spec.trainer, PartitionedNALPTrainer)
        metrics = spec.train()
        assert metrics["mrr"] > 0.3, metrics
        test_metrics = spec.eval("test", num_batches=2)
        assert "mrr" in test_metrics
        emb = spec.infer_batch(np.arange(11))  # not a multiple of 8: padded
        assert emb.shape == (11, 16)

    def test_partitioned_rejects_udl_edge_split(self):
        g, _, _, _ = _clustered_graph()
        cfg = _nalp_config(partitioned_backend="true",
                           split_strategy="udl_edge")
        spec = NodeAnchorLinkPredictionTaskSpec()
        import pytest as _pytest
        with _pytest.raises(ValueError, match="partitioned_backend"):
            spec.init_model(cfg, graph=g)


class TestPartitionedNodeClassificationDispatch:
    """partitioned_backend=true on the NC task spec (the v2 distributed
    stack serves node classification through the same loader)."""

    def _nc_config(self, **extra):
        gm = GraphMetadata.homogeneous()
        return TaskConfig(
            graph_metadata=gm,
            task_metadata=TaskMetadata(
                task_type=TaskMetadataType.NODE_BASED_TASK,
                supervision_node_types=gm.node_types),
            trainer=TrainerConfig(trainer_args={
                "hid_dim": "16", "num_layers": "2", "fanouts": "5,3",
                "main_sample_batch_size": "32", "learning_rate": "0.01",
                "num_epochs": "6", **extra,
            }),
        )

    @pytest.mark.slow
    def test_spec_trains_on_partitioned_backend(self):
        from gigl_tpu.training.dist_sampled import (
            PartitionedNodeClassificationTrainer,
        )

        g, _, _, _ = _clustered_graph(
            num_clusters=4, nodes_per_cluster=32, intra_edges=300)
        cfg = self._nc_config(partitioned_backend="true",
                              capacity_factor="8.0")
        spec = NodeClassificationTaskSpec()
        spec.init_model(cfg, graph=g)
        assert isinstance(spec.trainer,
                          PartitionedNodeClassificationTrainer)
        metrics = spec.train()
        assert metrics["accuracy"] > 0.5, metrics
        test_metrics = spec.eval("test")
        assert "accuracy" in test_metrics
        logits = spec.infer_batch(np.arange(11))  # padded to shard multiple
        assert logits.shape == (11, 4)

    def test_partitioned_rejects_inductive_split(self):
        g, _, _, _ = _clustered_graph(
            num_clusters=4, nodes_per_cluster=32, intra_edges=300)
        cfg = self._nc_config(partitioned_backend="true",
                              split_strategy="inductive_node")
        spec = NodeClassificationTaskSpec()
        with pytest.raises(ValueError, match="partitioned_backend"):
            spec.init_model(cfg, graph=g)


class TestStreamingPartitionedBackendDispatch:
    """trainerArgs streaming_partitioned_backend=true — config dispatch
    onto the beyond-HBM backend (r4 VERDICT missing 1): features live in
    sharded HOST RAM (no DeviceGraph is built at all), each step is a
    plan -> host owner-gather -> apply round
    (training/streaming_partitioned.py). The reference's equivalent regime
    is config-dispatched via featureFlags
    (ref pb_wrappers/gbml_config.py:416-429 should_run_glt_backend)."""

    def test_dispatch_constructs_streamed_partitioned_trainer(self):
        from gigl_tpu.training.streaming_partitioned import (
            StreamingPartitionedNALPTrainer,
        )

        g, _, _, _ = _clustered_graph()
        cfg = _nalp_config(streaming_partitioned_backend="true",
                           capacity_factor="8.0")
        spec = NodeAnchorLinkPredictionTaskSpec()
        spec.init_model(cfg, graph=g)
        assert isinstance(spec.trainer, StreamingPartitionedNALPTrainer)
        # Beyond-HBM contract: host store holds the fused rows; the spec
        # never built a DeviceGraph (features never touched device HBM).
        assert spec.trainer.host is not None
        emb = spec.infer_batch(np.arange(11))  # wrap-padded to batch_size
        assert emb.shape == (11, 16)

    @pytest.mark.slow
    def test_spec_trains_on_streamed_partitioned_backend(self, tmp_path):
        from gigl_tpu.training.streaming_partitioned import (
            StreamingPartitionedNALPTrainer,
        )

        g, _, _, _ = _clustered_graph()
        cfg = _nalp_config(num_epochs="3", val_every_num_batches="4",
                           num_val_batches="2",
                           streaming_partitioned_backend="true",
                           capacity_factor="8.0")
        spec = NodeAnchorLinkPredictionTaskSpec()
        spec.init_model(cfg, graph=g)
        assert isinstance(spec.trainer, StreamingPartitionedNALPTrainer)
        metrics = spec.train()
        assert metrics["mrr"] > 0.3, metrics
        test_metrics = spec.eval("test", num_batches=2)
        assert "mrr" in test_metrics

    def test_rejects_both_backends(self):
        g, _, _, _ = _clustered_graph()
        cfg = _nalp_config(streaming_partitioned_backend="true",
                           partitioned_backend="true")
        spec = NodeAnchorLinkPredictionTaskSpec()
        with pytest.raises(ValueError, match="only one of"):
            spec.init_model(cfg, graph=g)

    def test_rejects_udl_edge_split(self):
        g, _, _, _ = _clustered_graph()
        cfg = _nalp_config(streaming_partitioned_backend="true",
                           split_strategy="udl_edge")
        spec = NodeAnchorLinkPredictionTaskSpec()
        with pytest.raises(ValueError,
                           match="streaming_partitioned_backend"):
            spec.init_model(cfg, graph=g)

    @pytest.mark.slow
    def test_fit_checkpoint_auto_resume(self, tmp_path):
        """The fit contract's checkpoint/auto-resume over the streamed-
        partitioned backend: a second fit from the same checkpoint_dir
        resumes past the saved step (mirrors the HBM trainers' contract,
        fit_loop.py)."""
        import jax

        g, _, _, _ = _clustered_graph()
        cfg = _nalp_config(streaming_partitioned_backend="true",
                           capacity_factor="8.0")
        spec = NodeAnchorLinkPredictionTaskSpec()
        spec.init_model(cfg, graph=g)
        tr = spec.trainer
        train_a, val_a, _ = spec.splits
        ckpt = str(tmp_path / "ckpt")
        state = tr.init_state(jax.random.PRNGKey(0))
        state, _ = tr.fit(state, train_a, val_a, num_epochs=2,
                          val_every_n_batches=2, num_val_batches=1,
                          early_stop_patience=100, checkpoint_dir=ckpt)
        from gigl_tpu.training.checkpoint import latest_step

        saved = latest_step(ckpt)
        assert saved is not None and saved >= 2
        # Fresh state + same checkpoint dir: the loop restores and skips
        # the covered chunks (resume is exact on chunk boundaries).
        state2 = tr.init_state(jax.random.PRNGKey(0))
        state2, metrics2 = tr.fit(state2, train_a, val_a, num_epochs=2,
                                  val_every_n_batches=2, num_val_batches=1,
                                  early_stop_patience=100,
                                  checkpoint_dir=ckpt)
        assert int(np.asarray(state2.step)) >= saved
        assert "mrr" in metrics2


class TestHeteroBackendDispatch:
    """partitioned_backend / streaming_partitioned_backend on the TYPED
    (hetero) branch of the NALP spec: config-dispatched onto the
    HBM-partitioned typed trainer or the typed beyond-HBM regime
    (per-node-type sharded host stores) — the hetero half of the
    should_run_glt_backend analog."""

    @staticmethod
    def _cfg(**extra):
        from gigl_tpu.data.mocking import (
            BIPARTITE_TOY_GRAPH_LP,
            get_mocked_graph,
            mocked_task_config,
        )

        g = get_mocked_graph(BIPARTITE_TOY_GRAPH_LP)
        cfg = mocked_task_config(
            BIPARTITE_TOY_GRAPH_LP, conv="hgt", num_heads=2,
            random_negative_batch_size=32, **extra)
        return g, cfg

    def test_partitioned_hetero_dispatch(self):
        from gigl_tpu.training.dist_hetero import (
            PartitionedHeteroNALPTrainer,
        )

        g, cfg = self._cfg(partitioned_backend="true",
                           capacity_factor="8.0")
        spec = NodeAnchorLinkPredictionTaskSpec()
        spec.init_model(cfg, graph=g)
        assert isinstance(spec.trainer, PartitionedHeteroNALPTrainer)
        emb = spec.infer_batch(np.arange(5))
        assert emb.shape == (5, 32)

    def test_streamed_partitioned_hetero_dispatch(self):
        from gigl_tpu.training.streaming_partitioned import (
            StreamingPartitionedHeteroNALPTrainer,
        )

        g, cfg = self._cfg(streaming_partitioned_backend="true",
                           capacity_factor="8.0")
        spec = NodeAnchorLinkPredictionTaskSpec()
        spec.init_model(cfg, graph=g)
        assert isinstance(spec.trainer,
                          StreamingPartitionedHeteroNALPTrainer)
        # Beyond-HBM contract: no device feature shards at all.
        assert spec.trainer.pg.feats == {}
        emb = spec.infer_batch(np.arange(5))
        assert emb.shape == (5, 32)

    @pytest.mark.slow
    def test_streamed_partitioned_hetero_trains(self):
        g, cfg = self._cfg(streaming_partitioned_backend="true",
                           capacity_factor="8.0", num_epochs="6",
                           val_every_num_batches="3", num_val_batches="2",
                           tabularized="true")
        spec = NodeAnchorLinkPredictionTaskSpec()
        spec.init_model(cfg, graph=g)
        metrics = spec.train()
        assert metrics["mrr"] > 0.2, metrics
        test_metrics = spec.eval("test", num_batches=2)
        assert "mrr" in test_metrics


class TestStreamingPartitionedNCDispatch:
    """streaming_partitioned_backend=true on the NC task spec: the
    beyond-HBM backend serves node classification too (the reference's
    v2 loader serves NC through the same distributed stack)."""

    def _nc_config(self, **extra):
        gm = GraphMetadata.homogeneous()
        return TaskConfig(
            graph_metadata=gm,
            task_metadata=TaskMetadata(
                task_type=TaskMetadataType.NODE_BASED_TASK,
                supervision_node_types=gm.node_types),
            trainer=TrainerConfig(trainer_args={
                "hid_dim": "16", "num_layers": "2", "fanouts": "5,3",
                "main_sample_batch_size": "32", "learning_rate": "0.01",
                "num_epochs": "6", **extra,
            }),
        )

    def test_dispatch_and_trains(self):
        from gigl_tpu.training.streaming_partitioned import (
            StreamingPartitionedNodeClassificationTrainer,
        )

        g, _, _, _ = _clustered_graph(
            num_clusters=4, nodes_per_cluster=32, intra_edges=300)
        cfg = self._nc_config(streaming_partitioned_backend="true",
                              capacity_factor="8.0")
        spec = NodeClassificationTaskSpec()
        spec.init_model(cfg, graph=g)
        assert isinstance(spec.trainer,
                          StreamingPartitionedNodeClassificationTrainer)
        metrics = spec.train()
        assert metrics["accuracy"] > 0.5, metrics
        test_metrics = spec.eval("test")
        assert "accuracy" in test_metrics
        logits = spec.infer_batch(np.arange(11))
        assert logits.shape == (11, 4)

    def test_rejects_inductive_split(self):
        g, _, _, _ = _clustered_graph(
            num_clusters=4, nodes_per_cluster=32, intra_edges=300)
        cfg = self._nc_config(streaming_partitioned_backend="true",
                              split_strategy="inductive_node")
        spec = NodeClassificationTaskSpec()
        with pytest.raises(ValueError,
                           match="streaming_partitioned_backend"):
            spec.init_model(cfg, graph=g)
