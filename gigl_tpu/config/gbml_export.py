"""Export a TaskConfig as a reference-format GbmlConfig YAML.

The inverse of config/gbml_import.py: produces the camelCase json_format
mapping the reference's ProtoUtils writes (proto_utils.py:38
write_proto_to_yaml with MessageToDict), so a config authored or frozen in
this framework can drive reference-stack tooling during a mixed-fleet
migration. Round-trip guarantee: ``task_config_from_gbml_dict(
task_config_to_gbml_dict(cfg))`` preserves graph metadata, task metadata,
sampling strategy, split parameters, and the trainer/inferencer arg maps
(class paths are mapped back to the reference spec names where a known
mapping exists; unknown paths pass through unchanged).
"""

from __future__ import annotations

from typing import Dict, List, Mapping

import yaml

from gigl_tpu.config.gbml_import import _SPLIT_STRATEGY_MAP, _TRAINER_CLS_MAP
from gigl_tpu.config.task_config import SamplingOp, TaskConfig
from gigl_tpu.types.graph import EdgeType
from gigl_tpu.types.task import TaskMetadataType

_REV_TRAINER_CLS = {
    v: f"gigl.src.common.modeling_task_specs.{k}"
    for k, v in _TRAINER_CLS_MAP.items()
}
_REV_SPLIT_STRATEGY = {
    v: f"splitgenerator.lib.split_strategies.{k}"
    for k, v in _SPLIT_STRATEGY_MAP.items()
}


def _edge_type_dict(et: EdgeType) -> dict:
    return {"srcNodeType": str(et.src_node_type),
            "relation": str(et.relation),
            "dstNodeType": str(et.dst_node_type)}


def _sampling_op_dict(op: SamplingOp) -> dict:
    d: dict = {
        "opName": op.op_name,
        "edgeType": _edge_type_dict(op.edge_type),
        "samplingDirection": op.sampling_direction,
    }
    if op.input_op_names:
        d["inputOpNames"] = list(op.input_op_names)
    num = {"numNodesToSample": int(op.num_nodes_to_sample)}
    if op.sampling_method == "uniform":
        d["randomUniform"] = num
    elif op.sampling_method == "weighted":
        d["randomWeighted"] = dict(num)
    elif op.sampling_method == "top_k":
        d["topK"] = dict(num)
    else:
        raise ValueError(f"unmappable sampling method {op.sampling_method!r}")
    return d


def task_config_to_gbml_dict(cfg: TaskConfig) -> dict:
    """TaskConfig -> MessageToDict-style GbmlConfig mapping."""
    md = cfg.graph_metadata
    out: dict = {
        "graphMetadata": {
            "nodeTypes": [str(nt) for nt in md.node_types],
            "edgeTypes": [_edge_type_dict(et) for et in md.edge_types],
            "condensedNodeTypeMap": {
                str(k): str(v) for k, v in md.condensed_node_type_map.items()},
            "condensedEdgeTypeMap": {
                str(k): _edge_type_dict(v)
                for k, v in md.condensed_edge_type_map.items()},
        },
    }

    tm = cfg.task_metadata
    if tm.task_type is TaskMetadataType.NODE_BASED_TASK:
        out["taskMetadata"] = {"nodeBasedTaskMetadata": {
            "supervisionNodeTypes": [str(n)
                                     for n in tm.supervision_node_types]}}
    elif tm.task_type is TaskMetadataType.NODE_ANCHOR_BASED_LINK_PREDICTION_TASK:
        out["taskMetadata"] = {"nodeAnchorBasedLinkPredictionTaskMetadata": {
            "supervisionEdgeTypes": [_edge_type_dict(e)
                                     for e in tm.supervision_edge_types]}}
    else:
        out["taskMetadata"] = {"linkBasedTaskMetadata": {
            "supervisionEdgeTypes": [_edge_type_dict(e)
                                     for e in tm.supervision_edge_types]}}

    ds = cfg.dataset
    sgs: dict = {"numPositiveSamples": int(ds.num_positive_samples)}
    if ds.num_hard_negatives:
        sgs["numUserDefinedNegativeSamples"] = int(ds.num_hard_negatives)
    sampling = ds.sampling
    if sampling.message_passing_paths:
        sgs["subgraphSamplingStrategy"] = {"messagePassingPaths": {"paths": [
            {"rootNodeType": nt,
             "samplingOps": [_sampling_op_dict(op) for op in ops]}
            for nt, ops in sampling.message_passing_paths.items()]}}
    elif sampling.fanouts:
        ks = set(sampling.fanouts)
        if len(ks) == 1:
            # Round-trips through the deprecated flat form exactly.
            sgs["numHops"] = len(sampling.fanouts)
            sgs["numNeighborsToSample"] = int(sampling.fanouts[0])
        else:
            # Mixed fanouts have no flat-form encoding; emit a chain DAG
            # per supervision/root edge type.
            et = (tm.supervision_edge_types or md.edge_types)[0]
            ops = []
            prev: List[str] = []
            for i, k in enumerate(sampling.fanouts):
                ops.append({
                    "opName": f"hop_{i + 1}",
                    "edgeType": _edge_type_dict(et),
                    "randomUniform": {"numNodesToSample": int(k)},
                    "samplingDirection": "INCOMING",
                    **({"inputOpNames": prev} if prev else {}),
                })
                prev = [f"hop_{i + 1}"]
            sgs["subgraphSamplingStrategy"] = {"messagePassingPaths": {
                "paths": [{"rootNodeType": str(et.dst_node_type),
                           "samplingOps": ops}]}}
    if sampling.num_max_training_samples:
        sgs["numMaxTrainingSamplesToOutput"] = int(
            sampling.num_max_training_samples)

    sp = ds.split
    test_ratio = max(0.0, round(1.0 - sp.train_ratio - sp.val_ratio, 10))
    split_gen: dict = {
        "assignerArgs": {
            "seed": str(sp.seed),
            "train_split": str(sp.train_ratio),
            "val_split": str(sp.val_ratio),
            "test_split": str(test_ratio),
        },
    }
    if sp.strategy in _REV_SPLIT_STRATEGY:
        split_gen["splitStrategyClsPath"] = _REV_SPLIT_STRATEGY[sp.strategy]
    if sp.is_disjoint_mode:
        split_gen["splitStrategyArgs"] = {"is_disjoint_mode": "True"}

    dataset_cfg: dict = {"subgraphSamplerConfig": sgs,
                         "splitGeneratorConfig": split_gen}
    if ds.data_preprocessor_config_cls_path:
        dataset_cfg["dataPreprocessorConfig"] = {
            "dataPreprocessorConfigClsPath":
                ds.data_preprocessor_config_cls_path,
            **({"dataPreprocessorArgs": dict(ds.data_preprocessor_args)}
               if ds.data_preprocessor_args else {}),
        }
    out["datasetConfig"] = dataset_cfg

    out["trainerConfig"] = {
        "trainerClsPath": _REV_TRAINER_CLS.get(
            cfg.trainer.trainer_cls_path, cfg.trainer.trainer_cls_path),
        **({"trainerArgs": {str(k): str(v) for k, v in
                            cfg.trainer.trainer_args.items()}}
           if cfg.trainer.trainer_args else {}),
    }
    inf: dict = {}
    if cfg.inferencer.inferencer_cls_path:
        inf["inferencerClsPath"] = _REV_TRAINER_CLS.get(
            cfg.inferencer.inferencer_cls_path,
            cfg.inferencer.inferencer_cls_path)
    if cfg.inferencer.inferencer_args:
        inf["inferencerArgs"] = dict(cfg.inferencer.inferencer_args)
    if cfg.inferencer.inference_batch_size != 512:
        inf["inferenceBatchSize"] = int(cfg.inferencer.inference_batch_size)
    if inf:
        out["inferencerConfig"] = inf

    shared: dict = {}
    if cfg.shared.preprocessed_metadata_uri:
        shared["preprocessedMetadataUri"] = cfg.shared.preprocessed_metadata_uri
    if cfg.shared.trained_model_metadata_uri:
        shared["trainedModelMetadata"] = {
            "trainedModelUri": cfg.shared.trained_model_metadata_uri}
    if cfg.trainer.should_skip_training:
        shared["shouldSkipTraining"] = True
    flags = dict(cfg.feature_flags)
    if "is_graph_directed" in flags:
        shared["isGraphDirected"] = (
            flags.pop("is_graph_directed").lower() == "true")
    if shared:
        out["sharedConfig"] = shared
    if cfg.post_processor.post_processor_cls_path:
        out["postProcessorConfig"] = {
            "postProcessorClsPath":
                cfg.post_processor.post_processor_cls_path,
            **({"postProcessorArgs":
                dict(cfg.post_processor.post_processor_args)}
               if cfg.post_processor.post_processor_args else {}),
        }
    if cfg.metrics.metrics_cls_path:
        out["metricsConfig"] = {"metricsClsPath": cfg.metrics.metrics_cls_path}
    if cfg.profiler.should_enable_profiler:
        out["profilerConfig"] = {
            "shouldEnableProfiler": True,
            **({"profilerLogDir": cfg.profiler.profiler_log_dir}
               if cfg.profiler.profiler_log_dir else {}),
        }
    if flags:
        out["featureFlags"] = flags
    return out


def save_task_config_as_gbml_yaml(cfg: TaskConfig, path: str) -> None:
    with open(path, "w") as f:
        yaml.safe_dump(task_config_to_gbml_dict(cfg), f,
                       default_flow_style=False)
