"""Local pipeline runner: the six components + post processor, restartable.

Ref parity: `python/gigl/orchestration/local/runner.py:37-86` Runner.run
(pipeline_config, start_at) — runs Config Populator → Data Preprocessor →
Subgraph Sampler → Split Generator → Trainer → Inferencer → Post Processor
in order, resumable from any component against the same frozen config
(component restartability, SURVEY.md §5). KFP/VAI adapters can wrap the same
stage functions later (kfp_orchestrator.py:40-164).

TPU-native stage mapping:
  - Subgraph Sampler: no precomputed subgraph protos — sampling is live
    on-device at train time. The stage validates the sampling DAG and writes
    a flattened-graph manifest pointing at preprocessed assets (so the
    artifact contract and restartability survive).
  - Split Generator: computes + persists deterministic anchor/node splits
    (dataset_metadata), consumed by the trainer.
"""

from __future__ import annotations

import dataclasses
import enum
import io
import json
import time
from dataclasses import dataclass
from typing import Callable, Dict, List, Optional

import numpy as np
import yaml

from gigl_tpu.config.populator import ConfigPopulator
from gigl_tpu.config.task_config import TaskConfig
from gigl_tpu.config.validation import validate_task_config
from gigl_tpu.data.preprocessor import (
    DataPreprocessor,
    DataPreprocessorConfig,
    PreprocessedMetadata,
    load_graph_from_metadata,
)
from gigl_tpu.data.uri import UriFactory
from gigl_tpu.graph.splitters import HashedNodeAnchorLinkSplitter
from gigl_tpu.types.task import TaskMetadataType
from gigl_tpu.utils.logger import get_logger
from gigl_tpu.utils.registry import import_obj

logger = get_logger(__name__)


class Component(str, enum.Enum):
    CONFIG_POPULATOR = "config_populator"
    DATA_PREPROCESSOR = "data_preprocessor"
    SUBGRAPH_SAMPLER = "subgraph_sampler"
    SPLIT_GENERATOR = "split_generator"
    TRAINER = "trainer"
    INFERENCER = "inferencer"
    POST_PROCESSOR = "post_processor"


ORDER: List[Component] = list(Component)


@dataclass
class PipelineConfig:
    """Everything a local run needs (ref Runner's pipeline_config)."""

    job_name: str
    template_task_config_uri: str
    working_dir: str
    # Class path OR instance of the user's DataPreprocessorConfig.
    data_preprocessor_config: Optional[DataPreprocessorConfig] = None


class Runner:
    """Sequential local runner with start_at/stop_after gating."""

    def __init__(self, pipeline: PipelineConfig):
        self.pipeline = pipeline
        self.working = UriFactory.create(pipeline.working_dir)
        self._stage_fns: Dict[Component, Callable[[TaskConfig], None]] = {
            Component.DATA_PREPROCESSOR: self.run_data_preprocessor,
            Component.SUBGRAPH_SAMPLER: self.run_subgraph_sampler,
            Component.SPLIT_GENERATOR: self.run_split_generator,
            Component.TRAINER: self.run_trainer,
            Component.INFERENCER: self.run_inferencer,
            Component.POST_PROCESSOR: self.run_post_processor,
        }
        self._spec_cache = None

    # -- entry -----------------------------------------------------------------
    def run(self, start_at: Component = Component.CONFIG_POPULATOR,
            stop_after: Optional[Component] = None) -> TaskConfig:
        start_idx = ORDER.index(Component(start_at))
        stop_idx = ORDER.index(Component(stop_after)) if stop_after else len(ORDER) - 1
        frozen = self._frozen_config(run_populator=start_idx == 0)
        validate_task_config(frozen, start_at=str(start_at))
        for comp in ORDER[start_idx: stop_idx + 1]:
            if comp == Component.CONFIG_POPULATOR:
                continue  # handled above
            t0 = time.time()
            logger.info("=== running %s ===", comp.value)
            self._stage_fns[comp](frozen)
            logger.info("=== %s done in %.1fs ===", comp.value,
                        time.time() - t0)
        return frozen

    def _frozen_uri(self):
        return self.working.join(self.pipeline.job_name, "config_populator",
                                 "frozen_task_config.yaml")

    def _frozen_config(self, run_populator: bool) -> TaskConfig:
        if run_populator:
            pop = ConfigPopulator(self.pipeline.job_name,
                                  self.pipeline.working_dir)
            uri = pop.run(self.pipeline.template_task_config_uri)
            return TaskConfig.load(str(uri))
        return TaskConfig.load(str(self._frozen_uri()))

    # -- stages ----------------------------------------------------------------
    def run_data_preprocessor(self, frozen: TaskConfig) -> None:
        args = dict(frozen.dataset.data_preprocessor_args)
        # "num_workers" > 1 routes through the rank-sharded pipeline (the
        # Dataflow-parallelism analog; DataPreprocessor.run_sharded) —
        # output-equal to run(). Popped before the config class sees the
        # kwargs (it is a pipeline knob, not a preprocessor arg).
        workers = int(args.pop("num_workers", "1"))
        cfg = self.pipeline.data_preprocessor_config
        if cfg is None:
            cls_path = frozen.dataset.data_preprocessor_config_cls_path
            if not cls_path:
                raise ValueError(
                    "No data_preprocessor_config (instance or class path)")
            cfg = import_obj(cls_path)(**args)
        out_dir = UriFactory.create(
            frozen.shared.preprocessed_metadata_uri).uri.rsplit("/", 1)[0]
        pre = DataPreprocessor(cfg, out_dir)
        meta = pre.run_sharded(workers) if workers > 1 else pre.run()
        meta.save(frozen.shared.preprocessed_metadata_uri)

    def run_subgraph_sampler(self, frozen: TaskConfig) -> None:
        """Validates sampling config; writes the flattened-graph manifest.

        The heavy lifting of the reference's SGS (precomputing per-root
        subgraph protos, scala/subgraph_sampler) is replaced by live
        on-device sampling at train/inference time; this stage keeps the
        artifact contract (flattened_graph_metadata output location,
        flattened_graph_metadata.proto).
        """
        meta = PreprocessedMetadata.load(
            frozen.shared.preprocessed_metadata_uri)
        manifest = {
            "backend": "on_device_live_sampling",
            "preprocessed_metadata_uri":
                frozen.shared.preprocessed_metadata_uri,
            "fanouts": list(frozen.dataset.sampling.fanouts) or None,
            "message_passing_paths": {
                k: [op.to_dict() for op in ops]
                for k, ops in
                frozen.dataset.sampling.message_passing_paths.items()},
            "num_nodes": dict(meta.num_nodes),
        }
        # Optional v1-style materialization of rooted neighborhoods
        # (feature flag, ref SGS RootedNodeNeighborhood TFRecord output).
        if str(frozen.feature_flags.get(
                "should_materialize_subgraphs", "")).lower() in ("1", "true"):
            from gigl_tpu.sampling.materialize import (
                materialize_rooted_neighborhoods,
            )
            from gigl_tpu.training.dataset import DeviceGraph

            graph = load_graph_from_metadata(meta, frozen.graph_metadata)
            dg = DeviceGraph.from_hetero(graph)
            out_dir = UriFactory.create(
                frozen.shared.flattened_graph_metadata_uri
            ).uri.rsplit("/", 1)[0] + "/rooted_neighborhoods"
            fanouts = tuple(frozen.dataset.sampling.fanouts) or (10, 5)
            shards = materialize_rooted_neighborhoods(
                dg, out_dir, fanouts=fanouts,
                seed=frozen.dataset.split.seed)
            manifest["backend"] = "materialized_tabularized"
            manifest["rooted_neighborhood_shards"] = [str(s) for s in shards]
        UriFactory.create(frozen.shared.flattened_graph_metadata_uri
                          ).write_text(yaml.safe_dump(manifest))

    def run_split_generator(self, frozen: TaskConfig) -> None:
        """Computes deterministic splits and persists them
        (dataset_metadata contract, dataset_metadata.proto)."""
        meta = PreprocessedMetadata.load(
            frozen.shared.preprocessed_metadata_uri)
        graph = load_graph_from_metadata(meta, frozen.graph_metadata)
        sp = frozen.dataset.split
        tm = frozen.task_metadata
        split_uris = {}
        base = UriFactory.create(frozen.shared.dataset_metadata_uri
                                 ).uri.rsplit("/", 1)[0]
        if tm.task_type == TaskMetadataType.NODE_ANCHOR_BASED_LINK_PREDICTION_TASK:
            sup_types = tm.supervision_edge_types or graph.metadata.edge_types
            edge_index = {et: np.asarray(graph.edges[et]) for et in sup_types}
            splitter = HashedNodeAnchorLinkSplitter(
                sampling_direction="in", num_val=sp.val_ratio,
                num_test=max(1.0 - sp.train_ratio - sp.val_ratio, 0.0),
                supervision_edge_types=list(sup_types))
            splits = splitter(edge_index)
        else:
            splits = {}
            for nt in (tm.supervision_node_types or graph.metadata.node_types):
                ids = np.arange(graph.num_nodes[nt])
                splitter = HashedNodeAnchorLinkSplitter(
                    sampling_direction="in", num_val=sp.val_ratio,
                    num_test=max(1.0 - sp.train_ratio - sp.val_ratio, 0.0))
                splits[nt] = splitter(np.stack([ids, ids]))
        for nt, (tr, va, te) in splits.items():
            buf = io.BytesIO()
            np.savez_compressed(buf, train=tr, val=va, test=te)
            uri = UriFactory.create(f"{base}/splits_{nt}.npz")
            uri.write_bytes(buf.getvalue())
            split_uris[nt] = str(uri)
        UriFactory.create(frozen.shared.dataset_metadata_uri).write_text(
            yaml.safe_dump({"split_uris": split_uris,
                            "seed": sp.seed,
                            "strategy": sp.strategy}))

    # -- trainer ---------------------------------------------------------------
    def _build_spec(self, frozen: TaskConfig):
        if self._spec_cache is not None:
            return self._spec_cache
        meta = PreprocessedMetadata.load(
            frozen.shared.preprocessed_metadata_uri)
        graph = load_graph_from_metadata(meta, frozen.graph_metadata)
        spec_cls = import_obj(frozen.trainer.trainer_cls_path)
        spec = spec_cls(**frozen.trainer.trainer_args)
        spec.init_model(frozen, graph=graph)
        self._spec_cache = spec
        return spec

    def run_trainer(self, frozen: TaskConfig) -> None:
        spec = self._build_spec(frozen)
        model_dir = UriFactory.create(
            frozen.shared.trained_model_metadata_uri).uri.rsplit("/", 1)[0]
        if frozen.trainer.should_skip_training:
            metrics = {}
            logger.info("skip-training mode (pretrained warm start only)")
        else:
            metrics = spec.train()
            test_metrics = spec.eval("test")
            metrics.update({f"test_{k}": v for k, v in test_metrics.items()})
        spec.save(f"{model_dir}/model", step=0)
        UriFactory.create(frozen.shared.trained_model_metadata_uri).write_text(
            yaml.safe_dump({"model_uri": f"{model_dir}/model",
                            "eval_metrics": {k: float(v)
                                             for k, v in metrics.items()}}))
        # KFP metrics file (ref training_process.py:154-202 writes eval
        # metrics to the KFP metrics JSON consumed by the pipeline UI).
        from gigl_tpu.losses.metrics import EvalMetricsCollection

        collection = EvalMetricsCollection(
            {k.replace("@", "_at_"): float(v) for k, v in metrics.items()})
        UriFactory.create(f"{model_dir}/kfp_metrics.json").write_text(
            collection.to_kfp_metrics_json())

    def run_inferencer(self, frozen: TaskConfig) -> None:
        from gigl_tpu.data.export import EmbeddingExporter
        from gigl_tpu.inference.inferencer import (
            InferenceConfig,
            run_inference,
        )

        spec = self._build_spec(frozen)
        # Restore trained params if available (restart path).
        trained = UriFactory.create(frozen.shared.trained_model_metadata_uri)
        if trained.exists():
            from gigl_tpu.training.checkpoint import restore_params

            info = yaml.safe_load(trained.read_text())
            params = restore_params(info["model_uri"])
            spec.state = spec.state._replace(params=params)
        out_dir = UriFactory.create(
            frozen.shared.inference_metadata_uri).uri.rsplit("/", 1)[0]
        exporter = EmbeddingExporter(f"{out_dir}/embeddings")
        tr = spec.trainer
        if hasattr(tr, "graph"):
            num_nodes = tr.graph.num_nodes
        elif hasattr(tr, "store"):   # streamed backends (HostGraphStore)
            num_nodes = tr.store.num_nodes
        else:                        # HBM-partitioned (PartitionedGraph)
            num_nodes = tr.pg.num_nodes
        if isinstance(num_nodes, dict):  # hetero: embed the anchor node type
            num_nodes = num_nodes[str(spec.trainer.cfg.anchor_node_type)]
        n = run_inference(
            spec, num_nodes, exporter,
            InferenceConfig(
                batch_size=frozen.inferencer.inference_batch_size))
        inf_nt = (str(spec.trainer.cfg.anchor_node_type)
                  if hasattr(spec.trainer.cfg, "anchor_node_type")
                  else str(frozen.graph_metadata.node_types[0]))
        UriFactory.create(frozen.shared.inference_metadata_uri).write_text(
            yaml.safe_dump({"embeddings_dir": f"{out_dir}/embeddings",
                            "num_rows": int(n),
                            "node_type": inf_nt}))

    def run_post_processor(self, frozen: TaskConfig) -> None:
        """Un-enumeration of inferred assets + optional user hook
        (ref post_process/post_processor.py:32-146)."""
        from gigl_tpu.data.enumerate import Enumerator
        from gigl_tpu.data.export import read_embedding_shards

        inf = yaml.safe_load(UriFactory.create(
            frozen.shared.inference_metadata_uri).read_text())
        meta = PreprocessedMetadata.load(
            frozen.shared.preprocessed_metadata_uri)
        enum = Enumerator.load(meta.enumerator_uri)
        nt = inf.get("node_type") or frozen.graph_metadata.node_types[0]
        out_dir = UriFactory.create(
            frozen.shared.postprocessed_metadata_uri).uri.rsplit("/", 1)[0]
        total = 0
        for i, (ids, embs) in enumerate(
                read_embedding_shards(inf["embeddings_dir"])):
            orig = enum.unenumerate(nt, ids)
            buf = io.BytesIO()
            np.savez_compressed(buf, node_ids=orig, embeddings=embs)
            UriFactory.create(
                f"{out_dir}/unenumerated_shard_{i:05d}.npz"
            ).write_bytes(buf.getvalue())
            total += len(ids)
        result = {"unenumerated_dir": out_dir, "num_rows": int(total)}
        if frozen.post_processor.post_processor_cls_path:
            hook = import_obj(frozen.post_processor.post_processor_cls_path)(
                **frozen.post_processor.post_processor_args)
            hook_result = hook.run(frozen)
            result["user_post_processor"] = str(hook_result)
        UriFactory.create(frozen.shared.postprocessed_metadata_uri
                          ).write_text(yaml.safe_dump(result))
