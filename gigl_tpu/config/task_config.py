"""Typed task configuration — the YAML backbone of the pipeline.

TPU-native re-design of the reference's `GbmlConfig` protobuf
(ref: proto/snapchat/research/gbml/gbml_config.proto:18-236). We keep the
same conceptual shape — a *template* config authored by the user, then
*frozen* by the Config Populator with all inter-stage output paths filled in
(ref: python/gigl/src/config_populator/config_populator.py:507-559) — but
express it as plain dataclasses with dict/YAML round-trip instead of protobuf
codegen, since there is no cross-language (Scala) consumer in this framework.

Structure map (reference proto field -> here):
  graphMetadata              -> TaskConfig.graph_metadata
  taskMetadata               -> TaskConfig.task_metadata
  sharedConfig               -> TaskConfig.shared (output URIs, flags)
  datasetConfig              -> TaskConfig.dataset (preprocessor/sampling/split)
  trainerConfig              -> TaskConfig.trainer
  inferencerConfig           -> TaskConfig.inferencer
  postProcessorConfig        -> TaskConfig.post_processor
  metricsConfig/profilerConfig -> TaskConfig.metrics / TaskConfig.profiler
  featureFlags               -> TaskConfig.feature_flags
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Dict, List, Mapping, Optional, Sequence, Tuple

import yaml

from gigl_tpu.types.graph import EdgeType, GraphMetadata, _as_edge_type
from gigl_tpu.types.task import TaskMetadata, TaskMetadataType


def _dict_factory_omit_none(items):
    return {k: v for k, v in items if v is not None}


@dataclass
class SamplingOp:
    """One op in the subgraph-sampling DAG.

    Ref parity: `proto/snapchat/research/gbml/subgraph_sampling_strategy.proto:38-84`
    SamplingOp: named op sampling `num_nodes_to_sample` neighbors along
    `edge_type` in `sampling_direction`, wired to parents by `input_op_names`
    (empty = root op).
    """

    op_name: str
    edge_type: EdgeType
    num_nodes_to_sample: int
    input_op_names: Tuple[str, ...] = ()
    # uniform | weighted | top_k  (ref proto oneof sampling_method)
    sampling_method: str = "uniform"
    # INCOMING: sample in-edges of current frontier (frontier nodes are dst);
    # OUTGOING: sample out-edges (frontier nodes are src).
    # ref: subgraph_sampling_strategy.proto:26-29
    sampling_direction: str = "INCOMING"
    edge_feature_weight_index: int = 0  # for weighted/top_k

    def __post_init__(self):
        self.edge_type = _as_edge_type(self.edge_type)
        self.input_op_names = tuple(self.input_op_names)
        if self.num_nodes_to_sample <= 0:
            raise ValueError(
                f"SamplingOp {self.op_name!r}: num_nodes_to_sample must be > 0"
            )
        if self.sampling_direction not in ("INCOMING", "OUTGOING"):
            raise ValueError(
                f"SamplingOp {self.op_name!r}: bad direction "
                f"{self.sampling_direction!r}"
            )

    def to_dict(self) -> dict:
        return {
            "op_name": self.op_name,
            "edge_type": str(self.edge_type),
            "num_nodes_to_sample": self.num_nodes_to_sample,
            "input_op_names": list(self.input_op_names),
            "sampling_method": self.sampling_method,
            "sampling_direction": self.sampling_direction,
            "edge_feature_weight_index": self.edge_feature_weight_index,
        }

    @classmethod
    def from_dict(cls, d: Mapping) -> "SamplingOp":
        return cls(
            op_name=d["op_name"],
            edge_type=_as_edge_type(d["edge_type"]),
            num_nodes_to_sample=int(d["num_nodes_to_sample"]),
            input_op_names=tuple(d.get("input_op_names", ())),
            sampling_method=d.get("sampling_method", "uniform"),
            sampling_direction=d.get("sampling_direction", "INCOMING"),
            edge_feature_weight_index=int(d.get("edge_feature_weight_index", 0)),
        )


@dataclass
class SubgraphSamplingStrategy:
    """Per-root-node-type sampling DAGs, or a simple uniform fanout list.

    Ref parity: `subgraph_sampling_strategy.proto` MessagePassingPathStrategy.
    The common case (uniform k-hop with per-hop fanouts) can be given as
    ``fanouts=[15, 10]`` which expands to a chain DAG per root node type.
    """

    # Simple path: uniform per-hop fanouts applied to every edge type.
    fanouts: Tuple[int, ...] = ()
    # Full path: root node type -> list of SamplingOps forming a DAG.
    message_passing_paths: Dict[str, List[SamplingOp]] = field(default_factory=dict)
    # Downsample the training root-node set to at most this many anchors
    # (0 = keep all). Ref parity: gbml_config.proto:111
    # num_max_training_samples_to_output + SGS downsampleNumberOfNodes
    # (SGSPureSparkV1Task.scala:1042); here the subsample is deterministic
    # (hash-ordered prefix) rather than Spark's nondeterministic LIMIT.
    num_max_training_samples: int = 0

    def __post_init__(self):
        self.fanouts = tuple(int(f) for f in self.fanouts)

    def to_dict(self) -> dict:
        return {
            "fanouts": list(self.fanouts),
            "message_passing_paths": {
                k: [op.to_dict() for op in ops]
                for k, ops in self.message_passing_paths.items()
            },
            "num_max_training_samples": self.num_max_training_samples,
        }

    @classmethod
    def from_dict(cls, d: Mapping) -> "SubgraphSamplingStrategy":
        return cls(
            fanouts=tuple(d.get("fanouts", ())),
            message_passing_paths={
                k: [SamplingOp.from_dict(op) for op in ops]
                for k, ops in d.get("message_passing_paths", {}).items()
            },
            num_max_training_samples=int(
                d.get("num_max_training_samples", 0)),
        )


@dataclass
class SplitConfig:
    """Deterministic split configuration.

    Ref parity: split_generator assigners' hash-bucket semantics
    (`scala/split_generator/.../AbstractAssigners.scala:30-50`: deterministic
    hash over a granular bucket space) and the v2 node-hash splitter
    (`python/gigl/utils/data_splitters.py:90-260`).
    """

    train_ratio: float = 0.8
    val_ratio: float = 0.1
    # test ratio is the remainder
    seed: int = 42
    # "node_anchor": hash anchor nodes (v2 semantics, data_splitters.py:90);
    # "transductive_edge": hash edges into (split, usage) (v1 Appendix A.1);
    # "udl_edge": hash user-defined supervision edges into per-split
    #   SUPERVISION sets (v1 UserDefinedLabelsEdgeToLinkSplitHashingAssigner);
    # "transductive_node"/"inductive_node": node-ratio-bucket splits for
    #   node classification (v1 NodeToDatasetSplitHashingAssigner; inductive
    #   prunes each split's message graph to same-split endpoints).
    strategy: str = "node_anchor"
    is_disjoint_mode: bool = False  # train message/supervision disjoint (A.1)

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)

    @classmethod
    def from_dict(cls, d: Mapping) -> "SplitConfig":
        return cls(**dict(d))


@dataclass
class DatasetConfig:
    """Data-plane configuration: ingestion, preprocessing, sampling, splits.

    Ref parity: gbml_config.proto DatasetConfig (dataPreprocessorConfig,
    subgraphSamplerConfig, splitGeneratorConfig).
    """

    # Class path of a user DataPreprocessorConfig plugin (ref:
    # lib/data_preprocessor_config.py:27); optional — built-in ingestion
    # covers array/file sources.
    data_preprocessor_config_cls_path: Optional[str] = None
    data_preprocessor_args: Dict[str, str] = field(default_factory=dict)
    sampling: SubgraphSamplingStrategy = field(
        default_factory=SubgraphSamplingStrategy
    )
    # num positive edges sampled per anchor for NALP (ref SGS
    # numPositiveSamples); hard negatives per anchor (numUserDefinedNegativeSamples)
    num_positive_samples: int = 1
    num_hard_negatives: int = 0
    split: SplitConfig = field(default_factory=SplitConfig)

    def to_dict(self) -> dict:
        return {
            "data_preprocessor_config_cls_path": self.data_preprocessor_config_cls_path,
            "data_preprocessor_args": dict(self.data_preprocessor_args),
            "sampling": self.sampling.to_dict(),
            "num_positive_samples": self.num_positive_samples,
            "num_hard_negatives": self.num_hard_negatives,
            "split": self.split.to_dict(),
        }

    @classmethod
    def from_dict(cls, d: Mapping) -> "DatasetConfig":
        return cls(
            data_preprocessor_config_cls_path=d.get(
                "data_preprocessor_config_cls_path"
            ),
            data_preprocessor_args=dict(d.get("data_preprocessor_args", {})),
            sampling=SubgraphSamplingStrategy.from_dict(d.get("sampling", {})),
            num_positive_samples=int(d.get("num_positive_samples", 1)),
            num_hard_negatives=int(d.get("num_hard_negatives", 0)),
            split=SplitConfig.from_dict(d.get("split", {})),
        )


@dataclass
class TrainerConfig:
    """Trainer configuration.

    Ref parity: gbml_config.proto TrainerConfig (trainerClsPath + trainerArgs
    + command); user training logic is injected by class path
    (ref: training_process.py:122-139 dynamic import).
    """

    trainer_cls_path: str = (
        "gigl_tpu.training.task_specs.NodeAnchorLinkPredictionTaskSpec"
    )
    trainer_args: Dict[str, str] = field(default_factory=dict)
    # warm start / skip-training (ref: gbml_config.proto:57-58,
    # training_process.py:268-285)
    should_skip_training: bool = False
    pretrained_model_uri: Optional[str] = None
    log_every_n_batch: int = 50

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)

    @classmethod
    def from_dict(cls, d: Mapping) -> "TrainerConfig":
        return cls(**dict(d))


@dataclass
class InferencerConfig:
    """Ref parity: gbml_config.proto InferencerConfig (:200-212)."""

    inferencer_cls_path: Optional[str] = None
    inferencer_args: Dict[str, str] = field(default_factory=dict)
    inference_batch_size: int = 512  # ref gbml_config.proto:206-208

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)

    @classmethod
    def from_dict(cls, d: Mapping) -> "InferencerConfig":
        return cls(**dict(d))


@dataclass
class SharedConfig:
    """Populated by the Config Populator: all inter-stage output locations.

    Ref parity: gbml_config.proto SharedConfig (:38-70) — preprocessed
    metadata uri, flattened graph metadata, dataset metadata, trained model
    metadata, inference metadata, postprocessed metadata + shared flags.
    """

    preprocessed_metadata_uri: Optional[str] = None
    flattened_graph_metadata_uri: Optional[str] = None
    dataset_metadata_uri: Optional[str] = None
    trained_model_metadata_uri: Optional[str] = None
    inference_metadata_uri: Optional[str] = None
    postprocessed_metadata_uri: Optional[str] = None
    should_skip_automatic_temp_asset_cleanup: bool = False
    is_frozen: bool = False

    def to_dict(self) -> dict:
        return dataclasses.asdict(self, dict_factory=_dict_factory_omit_none)

    @classmethod
    def from_dict(cls, d: Mapping) -> "SharedConfig":
        return cls(**dict(d))


@dataclass
class ProfilerConfig:
    """Ref parity: gbml_config.proto:221-229 ProfilerConfig."""

    should_enable_profiler: bool = False
    profiler_log_dir: Optional[str] = None

    def to_dict(self) -> dict:
        return dataclasses.asdict(self, dict_factory=_dict_factory_omit_none)

    @classmethod
    def from_dict(cls, d: Mapping) -> "ProfilerConfig":
        return cls(**dict(d))


@dataclass
class MetricsConfig:
    """Ref parity: gbml_config.proto:220-223 MetricsConfig (pluggable publisher)."""

    metrics_cls_path: Optional[str] = None
    metrics_args: Dict[str, str] = field(default_factory=dict)

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)

    @classmethod
    def from_dict(cls, d: Mapping) -> "MetricsConfig":
        return cls(**dict(d))


@dataclass
class PostProcessorConfig:
    """Ref parity: gbml_config.proto postProcessorConfig (cls path + args)."""

    post_processor_cls_path: Optional[str] = None
    post_processor_args: Dict[str, str] = field(default_factory=dict)

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)

    @classmethod
    def from_dict(cls, d: Mapping) -> "PostProcessorConfig":
        return cls(**dict(d))


@dataclass
class TaskConfig:
    """The full task configuration (template or frozen).

    Ref parity: `GbmlConfig` (gbml_config.proto:18-236). Round-trips via
    YAML with `to_yaml` / `from_yaml` (ref: common/utils/proto_utils.py:21,38
    read/write_proto_from_yaml).
    """

    graph_metadata: GraphMetadata
    task_metadata: TaskMetadata
    dataset: DatasetConfig = field(default_factory=DatasetConfig)
    trainer: TrainerConfig = field(default_factory=TrainerConfig)
    inferencer: InferencerConfig = field(default_factory=InferencerConfig)
    post_processor: PostProcessorConfig = field(default_factory=PostProcessorConfig)
    shared: SharedConfig = field(default_factory=SharedConfig)
    profiler: ProfilerConfig = field(default_factory=ProfilerConfig)
    metrics: MetricsConfig = field(default_factory=MetricsConfig)
    feature_flags: Dict[str, str] = field(default_factory=dict)

    def to_dict(self) -> dict:
        return {
            "graph_metadata": self.graph_metadata.to_dict(),
            "task_metadata": self.task_metadata.to_dict(),
            "dataset": self.dataset.to_dict(),
            "trainer": self.trainer.to_dict(),
            "inferencer": self.inferencer.to_dict(),
            "post_processor": self.post_processor.to_dict(),
            "shared": self.shared.to_dict(),
            "profiler": self.profiler.to_dict(),
            "metrics": self.metrics.to_dict(),
            "feature_flags": dict(self.feature_flags),
        }

    @classmethod
    def from_dict(cls, d: Mapping) -> "TaskConfig":
        return cls(
            graph_metadata=GraphMetadata.from_dict(d["graph_metadata"]),
            task_metadata=TaskMetadata.from_dict(d["task_metadata"]),
            dataset=DatasetConfig.from_dict(d.get("dataset", {})),
            trainer=TrainerConfig.from_dict(d.get("trainer", {})),
            inferencer=InferencerConfig.from_dict(d.get("inferencer", {})),
            post_processor=PostProcessorConfig.from_dict(
                d.get("post_processor", {})
            ),
            shared=SharedConfig.from_dict(d.get("shared", {})),
            profiler=ProfilerConfig.from_dict(d.get("profiler", {})),
            metrics=MetricsConfig.from_dict(d.get("metrics", {})),
            feature_flags=dict(d.get("feature_flags", {})),
        )

    def to_yaml(self) -> str:
        return yaml.safe_dump(self.to_dict(), sort_keys=False)

    @classmethod
    def from_yaml(cls, text: str) -> "TaskConfig":
        return cls.from_dict(yaml.safe_load(text))

    def save(self, path: str) -> None:
        from gigl_tpu.data.uri import UriFactory

        UriFactory.create(path).write_text(self.to_yaml())

    @classmethod
    def load(cls, path: str) -> "TaskConfig":
        from gigl_tpu.data.uri import UriFactory

        return cls.from_yaml(UriFactory.create(path).read_text())
