"""Built-in modeling task specs — trainer + inferencer in one class.

Ref parity: `python/gigl/src/common/modeling_task_specs/` —
NodeAnchorBasedLinkPredictionModelingTaskSpec
(node_anchor_based_link_prediction_modeling_task_spec.py:66) and
NodeClassificationModelingTaskSpec (node_classification_modeling_task_spec.py:47).
Like the reference, each spec implements BOTH the BaseTrainer and
BaseInferencer interfaces and reads its hyperparameters from the
trainer_args string map (ArgumentReader pattern,
modeling_task_specs/utils/parameter_loading.py:8).

The spec owns: dataset build (split + supervision-edge selection from the
HeteroGraph), model construction from config, the train/eval loops
(delegated to gigl_tpu.training.trainer), checkpointing, warm start.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gigl_tpu.config.task_config import TaskConfig
from gigl_tpu.graph.csr import HeteroGraph
from gigl_tpu.graph.splitters import (
    DatasetSplit,
    HashedNodeAnchorLinkSplitter,
    NodeSplitAssigner,
    UserDefinedLabelsEdgeSplitter,
    downsample_root_nodes,
    inductive_message_mask,
    select_ssl_positive_edges,
)
from gigl_tpu.models.encoders import GNNEncoder, encoder_from_config
from gigl_tpu.models.link_prediction import (
    DecoderType,
    LinkPredictionDecoder,
    LinkPredictionGNN,
)
from gigl_tpu.training.base import BaseInferencer, BaseTrainer
from gigl_tpu.training.checkpoint import restore_params, save_params
from gigl_tpu.training.dataset import AnchorBatchIterator, DeviceGraph
from gigl_tpu.training.trainer import (
    NALPTrainer,
    NALPTrainerConfig,
    NodeClassificationTrainer,
    NodeClassificationTrainerConfig,
    TrainState,
)
from gigl_tpu.types.task import TaskMetadataType
from gigl_tpu.utils.logger import get_logger

logger = get_logger(__name__)


def _fanouts_from_config(cfg: TaskConfig, args: Dict[str, Any]) -> Tuple[int, ...]:
    if "fanouts" in args:
        v = args["fanouts"]
        if isinstance(v, str):
            return tuple(int(s) for s in v.replace(" ", "").split(","))
        return tuple(int(s) for s in v)
    sampling = cfg.dataset.sampling
    if sampling.fanouts:
        return tuple(sampling.fanouts)
    if sampling.message_passing_paths:
        # Chain-DAG depth-ordered fanouts for the (single) root path.
        ops = next(iter(sampling.message_passing_paths.values()))
        return tuple(op.num_nodes_to_sample for op in ops)
    return (10, 5)


class NodeAnchorLinkPredictionTaskSpec(BaseTrainer, BaseInferencer):
    """Self-/un-supervised node-anchor link prediction (NALP).

    Dataset semantics (v2/GLT path of the reference): anchor nodes are
    hash-split into train/val/test (`HashedNodeAnchorLinkSplitter`,
    data_splitters.py:90); supervision edges come from the task config's
    supervision edge types, or are self-supervised positives selected from
    structural edges (`select_ssl_positive_label_edges`,
    dataset_factory.py:38-54).
    """

    def __init__(self, **kwargs: Any):
        super().__init__(**kwargs)
        self.trainer: Optional[NALPTrainer] = None
        self.state: Optional[TrainState] = None
        self.splits: Optional[Tuple[np.ndarray, np.ndarray, np.ndarray]] = None
        self.task_config: Optional[TaskConfig] = None

    # -- setup -----------------------------------------------------------------
    def init_model(self, task_config: TaskConfig, state: Optional[Any] = None,
                   graph: Optional[HeteroGraph] = None):
        if graph is None:
            raise ValueError("NALP task spec requires graph=HeteroGraph")
        self.task_config = task_config
        args = {**task_config.trainer.trainer_args, **self.kwargs}
        # Heterogeneous graphs (multiple node types, or an explicit
        # SubgraphSamplingStrategy DAG) dispatch to the typed trainer —
        # the reference's single spec likewise serves HeteroData models.
        if (len(graph.metadata.node_types) > 1
                or task_config.dataset.sampling.message_passing_paths):
            return self._init_hetero(task_config, args, graph, state)
        fanouts = _fanouts_from_config(task_config, args)

        # Supervision edges: explicit supervision edge type or SSL positives.
        sup_types = task_config.task_metadata.supervision_edge_types
        et = sup_types[0] if sup_types else graph.metadata.edge_types[0]
        coo = graph.edges[et]
        ssl_ratio = float(args.get("ssl_positive_ratio", 0.0))
        if ssl_ratio > 0:
            cols = select_ssl_positive_edges(
                coo, ssl_ratio, seed=task_config.dataset.split.seed)
            sup_edges = coo[:, cols]
        else:
            sup_edges = coo

        sp = task_config.dataset.split
        strategy = str(args.get("split_strategy", sp.strategy))
        self._split_graphs = None
        streamed_part = str(args.get("streaming_partitioned_backend",
                                     "false")).lower() in ("1", "true")
        if strategy == "udl_edge":
            # User-defined-labels semantics (ref UserDefinedLabels
            # NodeAnchorBasedLinkPredictionSplitStrategy +
            # UserDefinedLabelsEdgeToLinkSplitHashingAssigner): the
            # user-provided supervision edges (and hard negatives) are
            # hash-split into TRAIN/VAL/TEST SUPERVISION; the full structural
            # graph stays the message graph in every split.
            udl = UserDefinedLabelsEdgeSplitter(
                train_ratio=sp.train_ratio, val_ratio=sp.val_ratio,
                seed=sp.seed,
                symmetric=str(args.get(
                    "should_split_edges_symmetrically", "false")
                ).lower() in ("1", "true"))
            sup_edges = np.asarray(sup_edges)
            parts = udl.split_edge_indices(sup_edges[0], sup_edges[1])
            hn_coo = None
            hn_name = args.get("hard_neg_edge_type")
            if hn_name:
                from gigl_tpu.types.graph import _as_edge_type

                hn_coo = np.asarray(graph.edges[_as_edge_type(hn_name)])
                hn_parts = udl.split_edge_indices(hn_coo[0], hn_coo[1])
            import dataclasses as _dc

            graphs = []
            for i in range(3):
                gi = DeviceGraph.from_hetero(
                    graph,
                    supervision_edges=sup_edges[:, parts[i]],
                    hard_neg_edges=(hn_coo[:, hn_parts[i]]
                                    if hn_coo is not None else None),
                    edge_type=et)
                if graphs:
                    # All splits share the SAME message graph and features
                    # on device (UDL keeps the full structural neighborhood
                    # in every split) — only supervision/hard-neg CSRs
                    # differ, so share the big buffers instead of
                    # re-uploading them 3x.
                    gi = _dc.replace(
                        gi, message_csr=graphs[0].message_csr,
                        node_features=graphs[0].node_features,
                        degrees=graphs[0].degrees,
                        edge_features=graphs[0].edge_features)
                graphs.append(gi)
            self._split_graphs = tuple(graphs)
            device_graph = graphs[0]
            # Anchors per split = anchor-side endpoints of that split's
            # supervision edges (sampling direction "in" anchors on dst).
            self.splits = tuple(np.unique(sup_edges[1, idx]) for idx in parts)
        else:
            # Anchor split (node-anchor hash semantics).
            splitter = HashedNodeAnchorLinkSplitter(
                sampling_direction="in",
                num_val=sp.val_ratio,
                num_test=max(1.0 - sp.train_ratio - sp.val_ratio, 0.0),
            )
            self.splits = splitter(np.asarray(sup_edges))
            if streamed_part:
                # Beyond-HBM backend: features must never touch device
                # HBM — no DeviceGraph is built at all (the HostGraphStore
                # below holds topology + features host-side).
                device_graph = None
            else:
                device_graph = DeviceGraph.from_hetero(
                    graph, supervision_edges=np.asarray(sup_edges),
                    edge_type=et)
        encoder = encoder_from_config(args)
        decoder = LinkPredictionDecoder(
            decoder_type=DecoderType(args.get("decoder", "inner_product")))
        model = LinkPredictionGNN(encoder=encoder, decoder=decoder)
        cfg = NALPTrainerConfig(
            fanouts=fanouts,
            num_positives=int(args.get(
                "num_positives", task_config.dataset.num_positive_samples)),
            num_hard_negs=int(args.get(
                "num_hard_negs", task_config.dataset.num_hard_negatives)),
            num_random_negs=int(args.get("random_negative_batch_size", 512)),
            loss_type=str(args.get("loss", "retrieval")),
            margin=float(args.get("margin", 0.5)),
            temperature=float(args.get("temperature", 0.07)),
            use_cms_correction=str(args.get("use_cms_correction", "false")
                                   ).lower() in ("1", "true"),
            seed=int(args.get("seed", sp.seed)),
            # Performance knobs (docs/performance.md): tabularized deepest-hop
            # cache (v1 frozen-sample semantics), its fused feature+cache
            # table, and int8 cache storage.
            cached_hop=str(args.get("cached_hop", "false")
                           ).lower() in ("1", "true"),
            fused_cache=str(args.get("fused_cache", "false")
                            ).lower() in ("1", "true"),
            quantize_cache=str(args.get("quantize_cache", "false")
                               ).lower() in ("1", "true"),
        )
        # Optional root-node downsampling of the train anchors (ref
        # num_max_training_samples_to_output, gbml_config.proto:111).
        max_train = int(args.get(
            "num_max_training_samples",
            task_config.dataset.sampling.num_max_training_samples))
        if max_train:
            self.splits = (
                downsample_root_nodes(self.splits[0], max_train, seed=sp.seed),
            ) + tuple(self.splits[1:])

        partitioned = str(args.get("partitioned_backend", "false")
                          ).lower() in ("1", "true")
        batch_size = max(1, min(int(args.get("main_sample_batch_size", 512)),
                                len(self.splits[0])))
        if streamed_part:
            # Beyond-HBM backend dispatch (the second half of the
            # should_run_glt_backend analog, ref pb_wrappers/gbml_config
            # .py:416-429): topology + fused features live in (sharded)
            # HOST RAM; device HBM holds only the O(N/P) adjacency ints;
            # each step is a plan -> host owner-gather -> apply round
            # (training/streaming_partitioned.py).
            if partitioned:
                raise ValueError("set only one of partitioned_backend / "
                                 "streaming_partitioned_backend")
            if self._split_graphs is not None:
                raise ValueError("streaming_partitioned_backend does not "
                                 "support the udl_edge split strategy")
            import dataclasses as _dc

            from gigl_tpu.parallel.mesh import make_mesh
            from gigl_tpu.training.streaming import HostGraphStore
            from gigl_tpu.training.streaming_partitioned import (
                StreamingPartitionedNALPTrainer,
            )

            mesh = make_mesh()
            n_sh = int(np.prod(list(mesh.shape.values())))
            cfg = _dc.replace(
                cfg, num_random_negs=-(-cfg.num_random_negs // n_sh) * n_sh,
                cached_hop=True, fused_cache=False, quantize_cache=False)
            nt = str(et.dst_node_type)
            hn_coo = None
            hn_name = args.get("hard_neg_edge_type")
            if hn_name:
                from gigl_tpu.types.graph import _as_edge_type

                hn_coo = np.asarray(graph.edges[_as_edge_type(hn_name)])
            store = HostGraphStore.build(
                message_edges=np.asarray(coo),
                supervision_edges=np.asarray(sup_edges),
                features=np.asarray(graph.node_features[nt], np.float32),
                num_nodes=int(graph.num_nodes[et.dst_node_type]),
                fanouts=cfg.fanouts, seed=cfg.seed,
                hard_neg_edges=hn_coo)
            batch_size = max(n_sh, batch_size // n_sh * n_sh)
            self.trainer = StreamingPartitionedNALPTrainer(
                model, store, mesh, cfg, batch_size=batch_size,
                optimizer_args=args,
                capacity_factor=float(args.get("capacity_factor", 4.0)),
                answer_dtype=str(args.get("answer_dtype", "float32")))
        elif partitioned:
            # The should_run_glt_backend analog (ref gbml_config
            # featureFlags, pb_wrappers/gbml_config.py:416-429): dispatch
            # training onto the PARTITIONED in-memory backend — graph +
            # features sharded O(N/P) across the device mesh, routed
            # sampling/hydration (training/dist_sampled.py).
            if self._split_graphs is not None:
                raise ValueError("partitioned_backend does not support the "
                                 "udl_edge split strategy (per-split "
                                 "supervision graphs); use the replicated "
                                 "backend")
            import dataclasses as _dc

            from gigl_tpu.parallel.mesh import make_mesh
            from gigl_tpu.training.dist_sampled import (
                PartitionedGraph,
                PartitionedNALPTrainer,
            )

            mesh = make_mesh()
            n_sh = int(np.prod(list(mesh.shape.values())))
            cfg = _dc.replace(
                cfg, num_random_negs=-(-cfg.num_random_negs // n_sh) * n_sh,
                cached_hop=False, fused_cache=False, quantize_cache=False,
                use_cms_correction=False)
            pgraph = PartitionedGraph.build(
                device_graph, mesh,
                quantize_features=str(args.get("quantize_features", "false")
                                      ).lower() in ("1", "true"))
            self.trainer = PartitionedNALPTrainer(
                model, pgraph, mesh, cfg, optimizer_args=args,
                capacity_factor=float(args.get("capacity_factor", 4.0)))
            batch_size = max(n_sh, batch_size // n_sh * n_sh)
        else:
            self.trainer = NALPTrainer(model, device_graph, cfg,
                                       optimizer_args=args)
            if self._split_graphs is not None:
                # fit()'s val cadence must draw positives from VAL-assigned
                # supervision edges, not the train graph's.
                self.trainer.eval_graph = self._split_graphs[DatasetSplit.VAL]
        # Clamp to the train split (iterator drops partial batches).
        self._batch_size = batch_size
        params = state
        if params is None and task_config.trainer.pretrained_model_uri:
            params = restore_params(task_config.trainer.pretrained_model_uri)
            logger.info("warm-started params from %s",
                        task_config.trainer.pretrained_model_uri)
        self.state = self.trainer.init_state(
            jax.random.PRNGKey(cfg.seed), batch_size, params=params)
        return self.state.params

    def _init_hetero(self, task_config: TaskConfig, args: Dict[str, Any],
                     graph: HeteroGraph, state: Optional[Any]):
        from gigl_tpu.models.hetero_encoders import hetero_encoder_from_config
        from gigl_tpu.models.link_prediction import HeteroLinkPredictionGNN
        from gigl_tpu.training.hetero_dataset import (
            HeteroDeviceGraph,
            paths_from_config,
        )
        from gigl_tpu.training.hetero_trainer import (
            HeteroNALPTrainer,
            HeteroNALPTrainerConfig,
        )

        sup_types = task_config.task_metadata.supervision_edge_types
        et = sup_types[0] if sup_types else graph.metadata.edge_types[0]
        sup_anchor = str(args.get("supervision_anchor", "dst"))
        anchor_nt = (str(et.dst_node_type) if sup_anchor == "dst"
                     else str(et.src_node_type))
        cand_nt = (str(et.src_node_type) if sup_anchor == "dst"
                   else str(et.dst_node_type))
        coo = graph.edges[et]
        ssl_ratio = float(args.get("ssl_positive_ratio", 0.0))
        sup_edges = coo
        if ssl_ratio > 0:
            cols = select_ssl_positive_edges(
                coo, ssl_ratio, seed=task_config.dataset.split.seed)
            sup_edges = coo[:, cols]

        sp = task_config.dataset.split
        # Anchor split over the anchor-side endpoints of supervision edges.
        anchor_row = sup_edges[1] if sup_anchor == "dst" else sup_edges[0]
        splitter = HashedNodeAnchorLinkSplitter(
            sampling_direction="in", num_val=sp.val_ratio,
            num_test=max(1.0 - sp.train_ratio - sp.val_ratio, 0.0))
        self.splits = splitter(np.stack([anchor_row, anchor_row]))

        partitioned = str(args.get("partitioned_backend", "false")
                          ).lower() in ("1", "true")
        streamed_part = str(args.get("streaming_partitioned_backend",
                                     "false")).lower() in ("1", "true")
        if partitioned and streamed_part:
            raise ValueError("set only one of partitioned_backend / "
                             "streaming_partitioned_backend")
        paths = paths_from_config(
            graph, task_config.dataset.sampling, [anchor_nt, cand_nt],
            default_fanouts=_fanouts_from_config(task_config, args))
        device_graph = HeteroDeviceGraph.from_hetero(
            graph, paths, supervision_edge_type=et,
            supervision_edges=np.asarray(sup_edges),
            supervision_anchor=sup_anchor,
            # Beyond-HBM typed route: per-type features stay host numpy.
            features_on_device=not streamed_part)
        encoder = hetero_encoder_from_config(
            args,
            node_types=[str(n) for n in graph.metadata.node_types],
            edge_types=[str(e) for e in graph.metadata.edge_types])
        decoder = LinkPredictionDecoder(
            decoder_type=DecoderType(args.get("decoder", "inner_product")))
        model = HeteroLinkPredictionGNN(encoder=encoder, decoder=decoder)
        cfg = HeteroNALPTrainerConfig(
            anchor_node_type=anchor_nt, candidate_node_type=cand_nt,
            num_positives=int(args.get(
                "num_positives", task_config.dataset.num_positive_samples)),
            num_hard_negs=int(args.get(
                "num_hard_negs", task_config.dataset.num_hard_negatives)),
            num_random_negs=int(args.get("random_negative_batch_size", 512)),
            loss_type=str(args.get("loss", "retrieval")),
            margin=float(args.get("margin", 0.5)),
            temperature=float(args.get("temperature", 0.07)),
            seed=int(args.get("seed", sp.seed)),
            # Typed tabularized fast path (frozen per-op sample tables)
            # and the ring global candidate pool — both config-driven
            # like their homogeneous counterparts.
            tabularized=str(args.get("tabularized", "false")
                            ).lower() in ("1", "true"),
            global_candidate_pool=str(
                args.get("global_candidate_pool", "false")
            ).lower() in ("1", "true"),
        )
        # Clamp to the train split (the iterator drops partial batches —
        # a batch size above the split would train zero steps).
        batch_size = max(1, min(
            int(args.get("main_sample_batch_size", 512)),
            len(self.splits[0])))
        if partitioned or streamed_part:
            # Typed backend dispatch (the hetero half of the
            # should_run_glt_backend analog, ref pb_wrappers/gbml_config
            # .py:416-429): HBM-partitioned typed graph, or the typed
            # beyond-HBM regime (per-node-type sharded HOST stores).
            import dataclasses as _dc

            from gigl_tpu.parallel.mesh import make_mesh
            from gigl_tpu.training.dist_hetero import (
                PartitionedHeteroGraph,
                PartitionedHeteroNALPTrainer,
            )

            mesh = make_mesh()
            n_sh = int(np.prod(list(mesh.shape.values())))
            cfg = _dc.replace(
                cfg, num_random_negs=-(-cfg.num_random_negs // n_sh) * n_sh)
            cf = float(args.get("capacity_factor", 4.0))
            batch_size = max(n_sh, batch_size // n_sh * n_sh)
            pgh = PartitionedHeteroGraph.build(
                device_graph, paths, mesh, anchor_node_type=anchor_nt,
                features_on_device=not streamed_part)
            if cfg.tabularized:
                pgh = pgh.with_sample_tables(device_graph, paths, mesh,
                                             seed=cfg.seed)
            if streamed_part:
                from gigl_tpu.training.streaming_partitioned import (
                    StreamingPartitionedHeteroNALPTrainer,
                )

                self.trainer = StreamingPartitionedHeteroNALPTrainer(
                    model, pgh, paths, cfg, mesh, batch_size=batch_size,
                    host_features={str(nt): np.asarray(f) for nt, f
                                   in device_graph.node_features.items()},
                    optimizer_args=args, capacity_factor=cf,
                    answer_dtype=str(args.get("answer_dtype", "float32")))
            else:
                self.trainer = PartitionedHeteroNALPTrainer(
                    model, pgh, paths, cfg, mesh, optimizer_args=args,
                    capacity_factor=cf)
        else:
            self.trainer = HeteroNALPTrainer(model, device_graph, paths,
                                             cfg, optimizer_args=args)
        self._batch_size = batch_size
        params = state
        if params is None and task_config.trainer.pretrained_model_uri:
            params = restore_params(task_config.trainer.pretrained_model_uri)
        self.state = self.trainer.init_state(
            jax.random.PRNGKey(cfg.seed), self._batch_size, params=params)
        return self.state.params

    # -- train/eval ------------------------------------------------------------
    def train(self, **kwargs) -> Dict[str, float]:
        assert self.trainer is not None and self.state is not None
        args = {**(self.task_config.trainer.trainer_args if self.task_config
                   else {}), **self.kwargs, **kwargs}
        train_anchors, val_anchors, _ = self.splits
        self.state, metrics = self.trainer.fit(
            self.state, train_anchors, val_anchors,
            batch_size=self._batch_size,
            num_epochs=int(args.get("num_epochs", 1)),
            val_every_n_batches=int(args.get("val_every_num_batches", 100)),
            num_val_batches=int(args.get("num_val_batches", 8)),
            early_stop_patience=int(args.get("early_stop_patience", 5)),
        )
        return metrics

    def eval(self, split: str = "test", num_batches: int = 16,
             **kwargs) -> Dict[str, float]:
        assert self.trainer is not None and self.state is not None
        idx = {"train": 0, "val": 1, "test": 2}[split]
        anchors = self.splits[idx]
        if getattr(self, "_split_graphs", None) is not None:
            # UDL edge split: positives for this split come from the
            # split's own supervision edges.
            self.trainer.eval_graph = self._split_graphs[idx]
        if len(anchors) == 0:
            return {"mrr": 0.0}
        if getattr(self.trainer, "_fixed_batch", False):
            # Streamed-partitioned step shapes are compiled for exactly
            # one batch size: wrap-pad the split pool to it.
            pool = np.resize(np.asarray(anchors),
                             max(len(anchors), self._batch_size))
            it = AnchorBatchIterator(pool, self._batch_size, seed=99)
        else:
            it = AnchorBatchIterator(
                anchors, min(self._batch_size, len(anchors)), seed=99)
        batches = []
        for i, b in enumerate(it.epoch(0)):
            if i >= num_batches:
                break
            batches.append(b)
        try:
            return self.trainer.evaluate(self.state.params, batches)
        finally:
            if getattr(self, "_split_graphs", None) is not None:
                # Restore the fit()-time default (val graph) so later
                # train() calls validate against VAL edges again.
                self.trainer.eval_graph = self._split_graphs[1]

    def save(self, uri, step: int = 0) -> None:
        save_params(uri, self.state.params, step=step)

    # -- inference -------------------------------------------------------------
    def infer_batch(self, batch: Any) -> jnp.ndarray:
        """batch: array of node ids → embeddings [B, D]."""
        assert self.trainer is not None and self.state is not None
        return self.trainer.encode_batch(self.state.params, batch)


class GraphSageTemplateTaskSpec(NodeAnchorLinkPredictionTaskSpec):
    """GraphSAGE template spec: the reference's beginner-facing trainer
    (ref modeling_task_specs/graphsage_template_modeling_spec.py:49) — a
    NALP spec pinned to a GraphSAGE encoder with margin loss and early
    stopping, all hyperparameters overridable through trainer_args."""

    DEFAULTS = {
        "conv": "graphsage",
        "loss": "margin",
        "num_layers": "2",
        "hid_dim": "256",
        "out_dim": "128",
        "early_stop_patience": "5",
    }

    def init_model(self, task_config: TaskConfig, state: Optional[Any] = None,
                   graph: Optional[HeteroGraph] = None):
        merged = {**self.DEFAULTS, **self.kwargs}
        self.kwargs = merged
        return super().init_model(task_config, state=state, graph=graph)


class NodeClassificationTaskSpec(BaseTrainer, BaseInferencer):
    """Supervised node classification task spec.

    Ref parity: NodeClassificationModelingTaskSpec (:47) — CE training over
    labeled nodes, accuracy eval, logits at inference.
    """

    def __init__(self, **kwargs: Any):
        super().__init__(**kwargs)
        self.trainer: Optional[NodeClassificationTrainer] = None
        self.state: Optional[TrainState] = None
        self.task_config: Optional[TaskConfig] = None

    def init_model(self, task_config: TaskConfig, state: Optional[Any] = None,
                   graph: Optional[HeteroGraph] = None):
        if graph is None:
            raise ValueError("task spec requires graph=HeteroGraph")
        self.task_config = task_config
        args = {**task_config.trainer.trainer_args, **self.kwargs}
        fanouts = _fanouts_from_config(task_config, args)
        sp = task_config.dataset.split
        strategy = str(args.get("split_strategy", sp.strategy))
        self._split_graphs = None
        nc_streamed = str(args.get("streaming_partitioned_backend",
                                   "false")).lower() in ("1", "true")
        if strategy == "inductive_node":
            # Inductive SNC (ref InductiveSupervisedNodeClassification
            # SplitStrategy): train/val/test graphs are DISJOINT — a split's
            # message edges keep only edges whose both endpoints are
            # assigned to that split.
            if len(graph.metadata.node_types) > 1:
                raise ValueError(
                    "inductive_node split supports homogeneous graphs")
            nt = graph.metadata.node_types[0]
            n = graph.num_nodes[nt]
            assigner = NodeSplitAssigner(
                train_ratio=sp.train_ratio, val_ratio=sp.val_ratio,
                seed=sp.seed)
            assignment = assigner(np.arange(n, dtype=np.int64))
            coo = np.asarray(graph.edges[graph.metadata.edge_types[0]])
            from gigl_tpu.graph.csr import HeteroGraph as _HG

            graphs = []
            for s in (DatasetSplit.TRAIN, DatasetSplit.VAL,
                      DatasetSplit.TEST):
                m = inductive_message_mask(assignment, coo[0], coo[1], s)
                gi = _HG.homogeneous(
                    coo[0][m], coo[1][m], num_nodes=n,
                    node_features=(graph.node_features[nt]
                                   if nt in graph.node_features else None),
                    node_labels=graph.node_labels.get(nt))
                graphs.append(DeviceGraph.from_hetero(gi))
            self._split_graphs = tuple(graphs)
            device_graph = graphs[0]
            self.splits = tuple(
                np.nonzero(assignment == np.int8(s))[0]
                for s in (DatasetSplit.TRAIN, DatasetSplit.VAL,
                          DatasetSplit.TEST))
        else:
            # Transductive SNC (ref TransductiveSupervisedNodeClassification
            # SplitStrategy): only root-node labels split; every split's
            # samples see the entire message graph. "transductive_node"
            # uses the v1 ratio-bucket NodeSplitAssigner; the default keeps
            # the v2 node-anchor hash-order split.
            if nc_streamed:
                # Beyond-HBM route: features never touch device HBM — no
                # DeviceGraph at all; splits run over the raw node range.
                device_graph = None
            else:
                device_graph = DeviceGraph.from_hetero(graph)
            nt0 = graph.metadata.node_types[0]
            n_nodes = int(graph.num_nodes[nt0])
            if strategy == "transductive_node":
                assigner = NodeSplitAssigner(
                    train_ratio=sp.train_ratio, val_ratio=sp.val_ratio,
                    seed=sp.seed)
                assignment = assigner(np.arange(n_nodes, dtype=np.int64))
                self.splits = tuple(
                    np.nonzero(assignment == np.int8(s))[0]
                    for s in (DatasetSplit.TRAIN, DatasetSplit.VAL,
                              DatasetSplit.TEST))
            else:
                labeled = np.arange(n_nodes)
                edges = np.stack([labeled, labeled])
                splitter = HashedNodeAnchorLinkSplitter(
                    sampling_direction="in", num_val=sp.val_ratio,
                    num_test=max(1.0 - sp.train_ratio - sp.val_ratio, 0.0))
                self.splits = splitter(edges)
        if device_graph is not None:
            labels_np = device_graph.node_labels
        else:
            nt0 = graph.metadata.node_types[0]
            labels_np = graph.node_labels.get(nt0)
        if labels_np is None:
            raise ValueError("graph has no node labels for classification")
        num_classes = int(args.get(
            "num_classes", int(np.asarray(labels_np).max()) + 1))
        encoder = encoder_from_config(args, out_dim=num_classes)
        nc_cfg = NodeClassificationTrainerConfig(
            fanouts=fanouts, seed=int(args.get("seed", 0)))
        self._batch_size = int(args.get("main_sample_batch_size", 256))
        self._partitioned = str(args.get("partitioned_backend", "false")
                                ).lower() in ("1", "true")
        if nc_streamed:
            # Beyond-HBM node classification (the NC face of the
            # streamed-partitioned backend): sharded HOST feature store,
            # device HBM holds adjacency ints + row-sharded labels
            # (training/streaming_partitioned.py).
            if self._partitioned:
                raise ValueError("set only one of partitioned_backend / "
                                 "streaming_partitioned_backend")
            if self._split_graphs is not None:
                raise ValueError("streaming_partitioned_backend does not "
                                 "support the inductive_node split")
            from gigl_tpu.parallel.mesh import make_mesh
            from gigl_tpu.training.streaming import HostGraphStore
            from gigl_tpu.training.streaming_partitioned import (
                StreamingPartitionedNodeClassificationTrainer,
            )

            import dataclasses as _dc

            mesh = make_mesh()
            n_sh = int(np.prod(list(mesh.shape.values())))
            nt0 = graph.metadata.node_types[0]
            et0 = graph.metadata.edge_types[0]
            coo = np.asarray(graph.edges[et0])
            nc_cfg = _dc.replace(nc_cfg, cached_hop=True)
            store = HostGraphStore.build(
                message_edges=coo, supervision_edges=coo,
                features=np.asarray(graph.node_features[str(nt0)],
                                    np.float32),
                num_nodes=int(graph.num_nodes[nt0]),
                fanouts=nc_cfg.fanouts, seed=nc_cfg.seed,
                node_labels=np.asarray(labels_np))
            self._batch_size = max(
                n_sh, self._batch_size // n_sh * n_sh)
            self.trainer = StreamingPartitionedNodeClassificationTrainer(
                encoder, store, mesh, nc_cfg, optimizer_args=args,
                batch_size=self._batch_size,
                capacity_factor=float(args.get("capacity_factor", 4.0)),
                answer_dtype=str(args.get("answer_dtype", "float32")))
            self._partitioned = True  # evaluate() takes batch lists
        elif self._partitioned:
            # should_run_glt_backend analog for node classification: the
            # reference's v2 loader serves NC through the same distributed
            # dataset stack (SURVEY.md §2.2); here the graph + labels shard
            # O(N/P) over the mesh with routed sampling/hydration.
            if self._split_graphs is not None:
                raise ValueError("partitioned_backend does not support the "
                                 "inductive_node split (per-split message "
                                 "graphs); use the replicated backend")
            from gigl_tpu.parallel.mesh import make_mesh
            from gigl_tpu.training.dist_sampled import (
                PartitionedGraph,
                PartitionedNodeClassificationTrainer,
            )

            mesh = make_mesh()
            n_sh = int(np.prod(list(mesh.shape.values())))
            pgraph = PartitionedGraph.build(
                device_graph, mesh,
                quantize_features=str(args.get("quantize_features", "false")
                                      ).lower() in ("1", "true"))
            self.trainer = PartitionedNodeClassificationTrainer(
                encoder, pgraph, mesh, nc_cfg, optimizer_args=args,
                capacity_factor=float(args.get("capacity_factor", 4.0)))
            self._batch_size = max(n_sh, self._batch_size // n_sh * n_sh)
        else:
            self.trainer = NodeClassificationTrainer(
                encoder, device_graph, nc_cfg, optimizer_args=args)
            if self._split_graphs is not None:
                self.trainer.eval_graph = self._split_graphs[DatasetSplit.VAL]
        params = state
        if params is None and task_config.trainer.pretrained_model_uri:
            params = restore_params(task_config.trainer.pretrained_model_uri)
        self.state = self.trainer.init_state(
            jax.random.PRNGKey(int(args.get("seed", 0))),
            self._batch_size, params=params)
        return self.state.params

    def train(self, **kwargs) -> Dict[str, float]:
        args = {**(self.task_config.trainer.trainer_args if self.task_config
                   else {}), **self.kwargs, **kwargs}
        train_nodes, val_nodes, _ = self.splits
        self.state, metrics = self.trainer.fit(
            self.state, train_nodes, val_nodes,
            batch_size=self._batch_size,
            num_epochs=int(args.get("num_epochs", 5)),
            early_stop_patience=int(args.get("early_stop_patience", 5)))
        return metrics

    def eval(self, split: str = "test", **kwargs) -> Dict[str, float]:
        idx = {"train": 0, "val": 1, "test": 2}[split]
        nodes = self.splits[idx]
        if getattr(self, "_split_graphs", None) is not None:
            # Inductive: each split classifies over its own pruned graph.
            self.trainer.eval_graph = self._split_graphs[idx]
        if len(nodes) == 0:
            return {"accuracy": 0.0}
        try:
            if getattr(self, "_partitioned", False):
                acc = self.trainer.evaluate(self.state.params, [nodes])
            else:
                acc = self.trainer.evaluate(self.state.params, nodes,
                                            self._batch_size)
        finally:
            if getattr(self, "_split_graphs", None) is not None:
                self.trainer.eval_graph = self._split_graphs[1]
        return {"accuracy": acc}

    def save(self, uri, step: int = 0) -> None:
        save_params(uri, self.state.params, step=step)

    def infer_batch(self, batch: Any) -> jnp.ndarray:
        return self.trainer.predict_batch(self.state.params, batch)


class LinkBasedTaskSpec(BaseTrainer, BaseInferencer):
    """Supervised link-based task spec (edge classification).

    Completes the reference's schema-only task flavor: LinkBasedTaskMetadata
    (gbml_config.proto:32-34) + SupervisedLinkBasedTaskSample
    (training_samples_schema.proto:56) define the contract but no modeling
    task spec ships for it. Labeled edges come either from ``labeled_edges``
    / ``edge_labels`` passed to init_model (e.g. imported via
    data.gbml.link_supervision_from_samples) or from the supervision edge
    type's edge-feature column named by trainerArgs
    ``edge_label_feature_index``. Edges are hash-split train/val/test with
    the UDL edge assigner semantics.
    """

    def __init__(self, **kwargs: Any):
        super().__init__(**kwargs)
        self.trainer = None
        self.state: Optional[TrainState] = None
        self.task_config: Optional[TaskConfig] = None
        self.splits: Optional[Tuple[np.ndarray, ...]] = None

    def init_model(self, task_config: TaskConfig, state: Optional[Any] = None,
                   graph: Optional[HeteroGraph] = None,
                   labeled_edges: Optional[np.ndarray] = None,
                   edge_labels: Optional[np.ndarray] = None):
        from gigl_tpu.training.link_task import (
            EdgeClassifierHead,
            LinkClassificationModel,
            LinkClassificationTrainer,
            LinkClassificationTrainerConfig,
        )

        if graph is None:
            raise ValueError("link task spec requires graph=HeteroGraph")
        self.task_config = task_config
        args = {**task_config.trainer.trainer_args, **self.kwargs}
        fanouts = _fanouts_from_config(task_config, args)
        sup_types = task_config.task_metadata.supervision_edge_types
        et = sup_types[0] if sup_types else graph.metadata.edge_types[0]
        if labeled_edges is None:
            labeled_edges = np.asarray(graph.edges[et])
            ef = graph.edge_features.features.get(str(et))
            if edge_labels is None:
                if ef is None:
                    raise ValueError(
                        "link task needs edge_labels or an edge-feature "
                        "column (edge_label_feature_index) to read labels "
                        "from")
                col = int(args.get("edge_label_feature_index", 0))
                edge_labels = np.asarray(ef)[:, col].astype(np.int64)
        labeled_edges = np.asarray(labeled_edges)
        edge_labels = np.asarray(edge_labels, dtype=np.int64)

        sp = task_config.dataset.split
        splitter = UserDefinedLabelsEdgeSplitter(
            train_ratio=sp.train_ratio, val_ratio=sp.val_ratio, seed=sp.seed)
        self.splits = splitter.split_edge_indices(labeled_edges[0],
                                                  labeled_edges[1])
        device_graph = DeviceGraph.from_hetero(graph, edge_type=et)
        num_classes = int(args.get("num_classes",
                                   int(edge_labels.max()) + 1))
        encoder = encoder_from_config(args)
        model = LinkClassificationModel(
            encoder=encoder,
            head=EdgeClassifierHead(
                num_classes=num_classes,
                hidden_dim=int(args.get("head_hidden_dim", 64)),
                combine=str(args.get("edge_combine", "hadamard"))))
        self.trainer = LinkClassificationTrainer(
            model, device_graph, labeled_edges, edge_labels,
            LinkClassificationTrainerConfig(
                fanouts=fanouts, seed=int(args.get("seed", sp.seed))),
            optimizer_args=args)
        self._batch_size = int(args.get("main_sample_batch_size", 256))
        params = state
        if params is None and task_config.trainer.pretrained_model_uri:
            params = restore_params(task_config.trainer.pretrained_model_uri)
        self.state = self.trainer.init_state(
            jax.random.PRNGKey(int(args.get("seed", 0))),
            self._batch_size, params=params)
        return self.state.params

    def train(self, **kwargs) -> Dict[str, float]:
        args = {**(self.task_config.trainer.trainer_args if self.task_config
                   else {}), **self.kwargs, **kwargs}
        tr_idx, va_idx, _ = self.splits
        self.state, metrics = self.trainer.fit(
            self.state, tr_idx, va_idx, batch_size=self._batch_size,
            num_epochs=int(args.get("num_epochs", 5)),
            early_stop_patience=int(args.get("early_stop_patience", 5)),
            log_every=int(args.get("log_every", 50)))
        return metrics

    def eval(self, split: str = "test", **kwargs) -> Dict[str, float]:
        idx = {"train": 0, "val": 1, "test": 2}[split]
        sel = self.splits[idx]
        if len(sel) == 0:
            return {"accuracy": 0.0}
        return {"accuracy": self.trainer.evaluate(
            self.state.params, sel, self._batch_size)}

    def infer_batch(self, batch) -> np.ndarray:
        """batch: [2, B] (src, dst) pairs -> class logits [B, C]."""
        batch = np.asarray(batch)
        return np.asarray(self.trainer.predict_batch(
            self.state.params, batch[0], batch[1]))

    def save(self, uri, step: int = 0) -> None:
        save_params(uri, self.state.params, step=step)
