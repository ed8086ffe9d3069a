"""Import reference GbmlConfig YAMLs (template or frozen) as TaskConfig.

The reference serializes its ``GbmlConfig`` proto to YAML with
protobuf json_format (camelCase keys — ref:
python/gigl/common/utils/proto_utils.py:21-45 read/write_proto_to_yaml with
MessageToDict/ParseDict). Teams migrating from the reference have fleets of
these YAMLs (templates checked into repos, frozen configs in GCS); this
module maps them onto gigl_tpu's native TaskConfig so an existing config
drives this framework unchanged.

Key map (GbmlConfig field, gbml_config.proto:18-236 -> TaskConfig):
  graphMetadata                       -> graph_metadata
  taskMetadata (oneof)                -> task_metadata
  sharedConfig                        -> shared (+ trainer.should_skip_training,
                                         feature_flags["is_graph_directed"])
  datasetConfig.dataPreprocessorConfig-> dataset.data_preprocessor_*
  datasetConfig.subgraphSamplerConfig -> dataset.sampling (numHops x
                                         numNeighborsToSample fanouts, or the
                                         full subgraphSamplingStrategy DAG),
                                         dataset.num_positive_samples /
                                         num_hard_negatives
  datasetConfig.splitGeneratorConfig  -> dataset.split (assignerArgs ratios +
                                         seed; splitStrategyClsPath name ->
                                         SplitConfig.strategy)
  trainerConfig                       -> trainer (reference modeling-task-spec
                                         class paths remapped to gigl_tpu
                                         task specs, args passed through)
  inferencerConfig / postProcessorConfig / metricsConfig / profilerConfig
                                      -> inferencer / post_processor /
                                         metrics / profiler
  featureFlags                        -> feature_flags
"""

from __future__ import annotations

from typing import Any, Dict, List, Mapping, Optional, Tuple

import yaml

from gigl_tpu.config.task_config import (
    DatasetConfig,
    InferencerConfig,
    MetricsConfig,
    PostProcessorConfig,
    ProfilerConfig,
    SamplingOp,
    SharedConfig,
    SplitConfig,
    SubgraphSamplingStrategy,
    TaskConfig,
    TrainerConfig,
)
from gigl_tpu.types.graph import EdgeType, GraphMetadata
from gigl_tpu.types.task import TaskMetadata, TaskMetadataType

# Reference modeling-task-spec class paths -> this framework's task specs
# (ref: python/gigl/src/common/modeling_task_specs/__init__.py exports).
_TRAINER_CLS_MAP = {
    "NodeAnchorBasedLinkPredictionModelingTaskSpec":
        "gigl_tpu.training.task_specs.NodeAnchorLinkPredictionTaskSpec",
    "NodeClassificationModelingTaskSpec":
        "gigl_tpu.training.task_specs.NodeClassificationTaskSpec",
    "GraphSageTemplateTrainerSpec":
        "gigl_tpu.training.task_specs.GraphSageTemplateTaskSpec",
}

# Reference split-strategy class names -> SplitConfig.strategy (semantics in
# gigl_tpu/graph/splitters.py; rules per SURVEY Appendix A.1).
_SPLIT_STRATEGY_MAP = {
    "TransductiveNodeAnchorBasedLinkPredictionSplitStrategy":
        "transductive_edge",
    "UserDefinedLabelsNodeAnchorBasedLinkPredictionSplitStrategy": "udl_edge",
    "TransductiveSupervisedNodeClassificationSplitStrategy":
        "transductive_node",
    "InductiveSupervisedNodeClassificationSplitStrategy": "inductive_node",
}


def _edge_type_from_dict(d: Mapping) -> EdgeType:
    return EdgeType(
        d.get("srcNodeType", ""), d.get("relation", ""),
        d.get("dstNodeType", ""))


def _graph_metadata(d: Mapping) -> GraphMetadata:
    return GraphMetadata(
        node_types=tuple(d.get("nodeTypes", ())),
        edge_types=tuple(
            _edge_type_from_dict(e) for e in d.get("edgeTypes", ())),
        condensed_node_type_map={
            int(k): v for k, v in d.get("condensedNodeTypeMap", {}).items()},
        condensed_edge_type_map={
            int(k): _edge_type_from_dict(v)
            for k, v in d.get("condensedEdgeTypeMap", {}).items()},
    )


def _task_metadata(d: Mapping) -> TaskMetadata:
    if "nodeBasedTaskMetadata" in d:
        return TaskMetadata(
            task_type=TaskMetadataType.NODE_BASED_TASK,
            supervision_node_types=tuple(
                d["nodeBasedTaskMetadata"].get("supervisionNodeTypes", ())))
    if "nodeAnchorBasedLinkPredictionTaskMetadata" in d:
        return TaskMetadata(
            task_type=TaskMetadataType.NODE_ANCHOR_BASED_LINK_PREDICTION_TASK,
            supervision_edge_types=tuple(
                _edge_type_from_dict(e)
                for e in d["nodeAnchorBasedLinkPredictionTaskMetadata"].get(
                    "supervisionEdgeTypes", ())))
    if "linkBasedTaskMetadata" in d:
        return TaskMetadata(
            task_type=TaskMetadataType.LINK_BASED_TASK,
            supervision_edge_types=tuple(
                _edge_type_from_dict(e)
                for e in d["linkBasedTaskMetadata"].get(
                    "supervisionEdgeTypes", ())))
    raise ValueError("taskMetadata has no recognized oneof member")


def _sampling_op(d: Mapping) -> SamplingOp:
    # oneof sampling_method (subgraph_sampling_strategy.proto:46-53).
    if "randomUniform" in d:
        method, num = "uniform", d["randomUniform"].get("numNodesToSample", 0)
    elif "randomWeighted" in d:
        method, num = "weighted", d["randomWeighted"].get("numNodesToSample", 0)
    elif "topK" in d:
        method, num = "top_k", d["topK"].get("numNodesToSample", 0)
    elif "userDefined" in d:
        raise ValueError(
            f"sampling op {d.get('opName')!r}: userDefined sampling methods "
            "are class-path plugins with no TPU equivalent; re-express the "
            "filter as edge weights and use randomWeighted/topK")
    else:
        raise ValueError(
            f"sampling op {d.get('opName')!r} has no sampling_method")
    return SamplingOp(
        op_name=d.get("opName", ""),
        edge_type=_edge_type_from_dict(d.get("edgeType", {})),
        num_nodes_to_sample=int(num),
        input_op_names=tuple(d.get("inputOpNames", ())),
        sampling_method=method,
        sampling_direction=d.get("samplingDirection", "INCOMING"),
    )


def _sampling_strategy(sgs: Mapping) -> Tuple[SubgraphSamplingStrategy, int, int]:
    """Returns (strategy, num_positive_samples, num_hard_negatives)."""
    fanouts: Tuple[int, ...] = ()
    paths: Dict[str, List[SamplingOp]] = {}
    strat = sgs.get("subgraphSamplingStrategy", {})
    if "messagePassingPaths" in strat:
        for p in strat["messagePassingPaths"].get("paths", ()):
            paths[p["rootNodeType"]] = [
                _sampling_op(op) for op in p.get("samplingOps", ())]
    elif "globalRandomUniform" in strat:
        g = strat["globalRandomUniform"]
        k = int(g.get("randomUniformSpec", {}).get("numNodesToSample", 10))
        fanouts = (k,) * int(g.get("numHops", 2))
    elif sgs.get("numHops"):
        # Deprecated flat form (gbml_config.proto:86-91), still the common
        # case in shipped configs (e.g. examples/MAG240M/task_config.yaml:27).
        k = int(sgs.get("numNeighborsToSample", 10))
        if k < 0:
            k = 0  # -1 = "no sampling"; 0 is rejected downstream with a
            # clear error since unbounded neighborhoods need the full-batch
            # (ELL) path rather than fanout sampling.
        fanouts = (k,) * int(sgs["numHops"])
    num_pos = int(sgs.get("numPositiveSamples",
                          sgs.get("numUserDefinedPositiveSamples", 1)) or 1)
    num_hard_neg = int(sgs.get("numUserDefinedNegativeSamples", 0) or 0)
    return (
        SubgraphSamplingStrategy(
            fanouts=fanouts, message_passing_paths=paths,
            num_max_training_samples=int(
                sgs.get("numMaxTrainingSamplesToOutput", 0) or 0)),
        num_pos,
        num_hard_neg,
    )


def _split_config(sg: Mapping) -> SplitConfig:
    args = dict(sg.get("assignerArgs", {}))
    args.update(sg.get("splitStrategyArgs", {}))
    train = float(args.get("train_split", 0.8))
    val = float(args.get("val_split", 0.1))
    strategy = "node_anchor"
    cls_path = sg.get("splitStrategyClsPath", "")
    cls_name = cls_path.rsplit(".", 1)[-1]
    if cls_name in _SPLIT_STRATEGY_MAP:
        strategy = _SPLIT_STRATEGY_MAP[cls_name]
    disjoint = str(args.get("is_disjoint_mode", "False")).lower() == "true"
    return SplitConfig(
        train_ratio=train, val_ratio=val,
        seed=int(args.get("seed", 42)),
        strategy=strategy, is_disjoint_mode=disjoint)


def _map_cls_path(path: Optional[str], mapping: Mapping[str, str]) -> Optional[str]:
    if not path:
        return None
    return mapping.get(path.rsplit(".", 1)[-1], path)


def task_config_from_gbml_dict(d: Mapping) -> TaskConfig:
    """Build a TaskConfig from a MessageToDict-style GbmlConfig mapping."""
    if "graphMetadata" not in d or "taskMetadata" not in d:
        raise ValueError(
            "not a GbmlConfig YAML: missing graphMetadata/taskMetadata")
    metadata = _graph_metadata(d["graphMetadata"])
    task_md = _task_metadata(d["taskMetadata"])

    ds = d.get("datasetConfig", {})
    sampling, num_pos, num_hard_neg = _sampling_strategy(
        ds.get("subgraphSamplerConfig", {}))
    dp = ds.get("dataPreprocessorConfig", {})
    dataset = DatasetConfig(
        data_preprocessor_config_cls_path=dp.get(
            "dataPreprocessorConfigClsPath"),
        data_preprocessor_args=dict(dp.get("dataPreprocessorArgs", {})),
        sampling=sampling,
        num_positive_samples=num_pos,
        num_hard_negatives=num_hard_neg,
        split=_split_config(ds.get("splitGeneratorConfig", {})),
    )

    sh = d.get("sharedConfig", {})
    shared = SharedConfig(
        preprocessed_metadata_uri=sh.get("preprocessedMetadataUri"),
        trained_model_metadata_uri=sh.get("trainedModelMetadata", {}).get(
            "trainedModelUri"),
        is_frozen=bool(sh.get("preprocessedMetadataUri")),
    )

    tr = d.get("trainerConfig", {})
    trainer = TrainerConfig(
        trainer_cls_path=_map_cls_path(
            tr.get("trainerClsPath") or tr.get("clsPath"),
            _TRAINER_CLS_MAP)
        or TrainerConfig().trainer_cls_path,
        trainer_args=dict(tr.get("trainerArgs", {})),
        should_skip_training=bool(sh.get("shouldSkipTraining", False)),
        pretrained_model_uri=sh.get("trainedModelMetadata", {}).get(
            "trainedModelUri") if sh.get("shouldSkipTraining") else None,
    )

    inf = d.get("inferencerConfig", {})
    inferencer = InferencerConfig(
        inferencer_cls_path=_map_cls_path(
            inf.get("inferencerClsPath") or inf.get("clsPath"),
            _TRAINER_CLS_MAP),
        inferencer_args=dict(inf.get("inferencerArgs", {})),
        inference_batch_size=int(inf.get("inferenceBatchSize", 512) or 512),
    )

    pp = d.get("postProcessorConfig", {})
    mc = d.get("metricsConfig", {})
    pf = d.get("profilerConfig", {})

    flags = {str(k): str(v) for k, v in d.get("featureFlags", {}).items()}
    if "isGraphDirected" in sh:
        flags.setdefault("is_graph_directed", str(sh["isGraphDirected"]))
    if sh.get("shouldIncludeIsolatedNodesInTraining"):
        flags.setdefault("should_include_isolated_nodes_in_training", "True")

    return TaskConfig(
        graph_metadata=metadata,
        task_metadata=task_md,
        dataset=dataset,
        trainer=trainer,
        inferencer=inferencer,
        post_processor=PostProcessorConfig(
            post_processor_cls_path=pp.get("postProcessorClsPath"),
            post_processor_args=dict(pp.get("postProcessorArgs", {}))),
        shared=shared,
        profiler=ProfilerConfig(
            should_enable_profiler=bool(pf.get("shouldEnableProfiler", False)),
            profiler_log_dir=pf.get("profilerLogDir")),
        metrics=MetricsConfig(
            metrics_cls_path=mc.get("metricsClsPath"),
            metrics_args=dict(mc.get("metricsArgs", {}))),
        feature_flags=flags,
    )


def task_config_from_gbml_yaml(path: str) -> TaskConfig:
    """Load a reference GbmlConfig YAML file (template or frozen)."""
    with open(path) as f:
        return task_config_from_gbml_dict(yaml.safe_load(f))
