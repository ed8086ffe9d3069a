"""Data Preprocessor component: enumeration + feature transform + metadata.

Ref parity: `python/gigl/src/data_preprocessor/data_preprocessor.py:86+` —
per node/edge type: (a) enumerate ids (lib/enumerate), (b) run the user
preprocessing_fn as an analyze-then-transform job (lib/transform), (c) write
transformed outputs + a `PreprocessedMetadata` manifest consumed by every
later stage (preprocessed_metadata.proto:5-65). The user plugin is a
``DataPreprocessorConfig`` subclass addressed by class path
(lib/data_preprocessor_config.py:27-55).

TPU-native: sources are record-batch iterators (in-memory arrays, npz, or
custom); outputs are npz shards + YAML metadata. Entity types process
sequentially or via threads (the reference caps at 4 parallel Dataflow jobs,
data_preprocessor.py:353-356 — here IO-bound thread parallelism only).
"""

from __future__ import annotations

import abc
import dataclasses
import io
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field
from typing import Callable, Dict, Iterable, Iterator, List, Mapping, Optional

import numpy as np
import yaml

from gigl_tpu.data.enumerate import Enumerator
from gigl_tpu.data.transform import TransformSpec
from gigl_tpu.data.uri import UriFactory
from gigl_tpu.types.graph import EdgeType, GraphMetadata, NodeType
from gigl_tpu.utils.logger import get_logger

logger = get_logger(__name__)

RecordBatch = Mapping[str, np.ndarray]


@dataclass
class NodeDataSource:
    """One node type's raw data (ref BigqueryNodeDataReference analog,
    lib/ingest/bigquery.py:30). ``batches()`` streams dict-of-column
    record batches; ``id_column`` names the raw node-id column."""

    node_type: NodeType
    id_column: str
    batch_fn: Callable[[], Iterator[RecordBatch]]
    label_column: Optional[str] = None

    def batches(self) -> Iterator[RecordBatch]:
        return self.batch_fn()

    @classmethod
    def from_arrays(cls, node_type: NodeType, ids: np.ndarray,
                    features: Mapping[str, np.ndarray],
                    labels: Optional[np.ndarray] = None,
                    batch_size: int = 65536) -> "NodeDataSource":
        cols = {"__id__": np.asarray(ids), **{k: np.asarray(v)
                                              for k, v in features.items()}}
        if labels is not None:
            cols["__label__"] = np.asarray(labels)

        def gen():
            n = len(cols["__id__"])
            for i in range(0, n, batch_size):
                yield {k: v[i: i + batch_size] for k, v in cols.items()}

        return cls(node_type=node_type, id_column="__id__", batch_fn=gen,
                   label_column="__label__" if labels is not None else None)


@dataclass
class EdgeDataSource:
    """One edge type's raw edge list (+ optional edge features)."""

    edge_type: EdgeType
    src_column: str
    dst_column: str
    batch_fn: Callable[[], Iterator[RecordBatch]]

    def batches(self) -> Iterator[RecordBatch]:
        return self.batch_fn()

    @classmethod
    def from_arrays(cls, edge_type: EdgeType, src: np.ndarray,
                    dst: np.ndarray,
                    features: Optional[Mapping[str, np.ndarray]] = None,
                    batch_size: int = 1 << 20) -> "EdgeDataSource":
        cols = {"__src__": np.asarray(src), "__dst__": np.asarray(dst)}
        for k, v in (features or {}).items():
            cols[k] = np.asarray(v)

        def gen():
            n = len(cols["__src__"])
            for i in range(0, n, batch_size):
                yield {k: v[i: i + batch_size] for k, v in cols.items()}

        return cls(edge_type=edge_type, src_column="__src__",
                   dst_column="__dst__", batch_fn=gen)


class DataPreprocessorConfig(abc.ABC):
    """User plugin: declares sources and per-type transform specs.

    Ref parity: lib/data_preprocessor_config.py:27-55 (prepare_for_pipeline,
    get_nodes_preprocessing_spec, get_edges_preprocessing_spec).
    """

    def prepare_for_pipeline(self) -> None:  # optional hook
        pass

    @abc.abstractmethod
    def node_sources(self) -> List[NodeDataSource]:
        ...

    @abc.abstractmethod
    def edge_sources(self) -> List[EdgeDataSource]:
        ...

    def node_transform(self, node_type: NodeType) -> Optional[TransformSpec]:
        return None  # None -> identity over all non-id columns

    def edge_transform(self, edge_type: EdgeType) -> Optional[TransformSpec]:
        return None


@dataclass
class PreprocessedMetadata:
    """Manifest of preprocessed outputs (ref preprocessed_metadata.proto)."""

    num_nodes: Dict[str, int] = field(default_factory=dict)
    node_feature_dim: Dict[str, int] = field(default_factory=dict)
    node_feature_uris: Dict[str, str] = field(default_factory=dict)
    node_label_uris: Dict[str, str] = field(default_factory=dict)
    edge_uris: Dict[str, str] = field(default_factory=dict)
    edge_feature_dim: Dict[str, int] = field(default_factory=dict)
    enumerator_uri: str = ""
    transform_stats_uris: Dict[str, str] = field(default_factory=dict)

    def to_yaml(self) -> str:
        return yaml.safe_dump(dataclasses.asdict(self), sort_keys=False)

    @classmethod
    def from_yaml(cls, text: str) -> "PreprocessedMetadata":
        return cls(**yaml.safe_load(text))

    def save(self, uri) -> None:
        UriFactory.create(uri).write_text(self.to_yaml())

    @classmethod
    def load(cls, uri) -> "PreprocessedMetadata":
        return cls.from_yaml(UriFactory.create(uri).read_text())


def _write_npz(uri, **arrays) -> None:
    buf = io.BytesIO()
    np.savez_compressed(buf, **arrays)
    UriFactory.create(uri).write_bytes(buf.getvalue())


def read_npz(uri) -> Dict[str, np.ndarray]:
    with np.load(io.BytesIO(UriFactory.create(uri).read_bytes()),
                 allow_pickle=False) as z:
        return {k: z[k] for k in z.files}


class DataPreprocessor:
    """Runs enumeration + transform for all sources; writes outputs."""

    def __init__(self, config: DataPreprocessorConfig, output_dir,
                 max_workers: int = 4):
        self.config = config
        self.output_dir = UriFactory.create(output_dir)
        # Ref parity: thread pool capped at 4 (data_preprocessor.py:353-356).
        self.max_workers = max_workers

    def run(self) -> PreprocessedMetadata:
        self.config.prepare_for_pipeline()
        node_sources = self.config.node_sources()
        edge_sources = self.config.edge_sources()
        meta = PreprocessedMetadata()

        # Pass 0: enumerate all node ids.
        enumerator = Enumerator()
        ids_by_type: Dict[NodeType, List[np.ndarray]] = {}
        for src in node_sources:
            for batch in src.batches():
                ids_by_type.setdefault(src.node_type, []).append(
                    batch[src.id_column])
        enumerator.enumerate_nodes(
            {nt: np.concatenate(chunks) for nt, chunks in ids_by_type.items()})
        enum_uri = self.output_dir.join("enumeration.npz")
        enumerator.save(enum_uri)
        meta.enumerator_uri = str(enum_uri)

        with ThreadPoolExecutor(max_workers=self.max_workers) as pool:
            node_futs = [pool.submit(self._process_node_source, s, enumerator,
                                     meta) for s in node_sources]
            edge_futs = [pool.submit(self._process_edge_source, s, enumerator,
                                     meta) for s in edge_sources]
            for f in node_futs + edge_futs:
                f.result()

        meta_uri = self.output_dir.join("preprocessed_metadata.yaml")
        meta.save(meta_uri)
        logger.info("preprocessed metadata written to %s", meta_uri)
        return meta

    # -- rank-sharded (multi-worker) pipeline ---------------------------------
    #
    # The Dataflow/Beam-parallelism analog (ref data_preprocessor.py runs
    # the TFT analyze+transform as an autoscaled Beam job): W independent
    # worker processes each handle the batch slice {i : i % W == rank} of
    # every source, in the same two phases TFT uses —
    #   1. run_analyze_shard(rank, W): local sufficient statistics + local
    #      node-id sets  ->  shard artifacts under _shards/,
    #   2. merge_analysis(W): coordinator merges the (fully mergeable)
    #      stats + id sets into the frozen enumeration + transform stats
    #      (the transform_fn asset analog),
    #   3. run_transform_shard(rank, W): workers apply the FROZEN merged
    #      stats to their slice, writing per-shard feature/edge chunks,
    #   4. finalize(W): coordinator assembles chunks into the canonical
    #      outputs + metadata.
    # Node feature rows land keyed by dense id, so the assembled outputs
    # equal the single-process run()'s (edge ROW order is shard-major
    # within a source; the graph is order-invariant — CSR construction
    # sorts by anchor and edge features stay row-aligned).

    def _shard_dir(self):
        return self.output_dir.join("_shards")

    @staticmethod
    def _sliced(batches, rank: int, world_size: int):
        for i, b in enumerate(batches):
            if i % world_size == rank:
                yield b

    def _specs(self):
        """Deterministic per-source TransformSpecs (same on every rank)."""
        node_specs, edge_specs = [], []
        for src in self.config.node_sources():
            spec = self.config.node_transform(src.node_type)
            if spec is None:
                first = next(iter(src.batches()), None)
                feat_cols = [c for c in (first or {})
                             if c not in (src.id_column, src.label_column)]
                from gigl_tpu.data.transform import Identity

                spec = TransformSpec(
                    ops={c: Identity(c) for c in sorted(feat_cols)})
            node_specs.append(spec)
        for src in self.config.edge_sources():
            edge_specs.append(self.config.edge_transform(src.edge_type))
        return node_specs, edge_specs

    def run_analyze_shard(self, rank: int, world_size: int) -> None:
        self.config.prepare_for_pipeline()
        node_specs, edge_specs = self._specs()
        sd = self._shard_dir()
        ids_arrays = {}
        for si, src in enumerate(self.config.node_sources()):
            chunks = [np.asarray(b[src.id_column]) for b in
                      self._sliced(src.batches(), rank, world_size)]
            key = f"src{si}_{src.node_type}"
            ids_arrays[key] = (np.concatenate(chunks) if chunks
                               else np.empty(0, np.int64))
            stats = node_specs[si].analyze(
                self._sliced(src.batches(), rank, world_size))
            node_specs[si].save_stats(
                stats, sd.join(f"analyze_node{si}_r{rank}.json"))
        for si, src in enumerate(self.config.edge_sources()):
            if edge_specs[si] is not None:
                stats = edge_specs[si].analyze(
                    self._sliced(src.batches(), rank, world_size))
                edge_specs[si].save_stats(
                    stats, sd.join(f"analyze_edge{si}_r{rank}.json"))
        _write_npz(sd.join(f"ids_r{rank}.npz"), **ids_arrays)

    def merge_analysis(self, world_size: int) -> None:
        node_specs, edge_specs = self._specs()
        sd = self._shard_dir()
        # ids: union across shards, per node type (Enumerator sorts, so
        # the dense mapping is independent of shard composition).
        ids_by_type: Dict[NodeType, List[np.ndarray]] = {}
        for r in range(world_size):
            arrays = read_npz(sd.join(f"ids_r{r}.npz"))
            for key, ids in arrays.items():
                nt = NodeType(key.split("_", 1)[1])
                ids_by_type.setdefault(nt, []).append(ids)
        enumerator = Enumerator()
        enumerator.enumerate_nodes(
            {nt: np.concatenate(c) for nt, c in ids_by_type.items()})
        enumerator.save(self.output_dir.join("enumeration.npz"))

        def merge_kind(kind, si, spec):
            merged = None
            for r in range(world_size):
                _, stats = TransformSpec.load_stats(
                    sd.join(f"analyze_{kind}{si}_r{r}.json"))
                if merged is None:
                    merged = stats
                else:
                    for name, s in stats.items():
                        merged[name].merge(s)
            spec.save_stats(merged,
                            sd.join(f"merged_{kind}{si}.json"))

        for si, spec in enumerate(node_specs):
            merge_kind("node", si, spec)
        for si, spec in enumerate(edge_specs):
            if spec is not None:
                merge_kind("edge", si, spec)

    def run_transform_shard(self, rank: int, world_size: int) -> None:
        sd = self._shard_dir()
        enumerator = Enumerator.load(self.output_dir.join("enumeration.npz"))
        for si, src in enumerate(self.config.node_sources()):
            spec, stats = TransformSpec.load_stats(
                sd.join(f"merged_node{si}.json"))
            dense_l, x_l, lab_l = [], [], []
            for batch in self._sliced(src.batches(), rank, world_size):
                dense_l.append(
                    enumerator.maps[src.node_type].to_dense(
                        batch[src.id_column]))
                x_l.append(spec.apply(stats, batch) if spec.ops
                           else np.zeros((len(dense_l[-1]), 0), np.float32))
                if src.label_column and src.label_column in batch:
                    lab_l.append(np.asarray(batch[src.label_column],
                                            np.int64).reshape(-1))
            if lab_l and len(lab_l) != len(dense_l):
                # Report the inconsistent source here rather than letting
                # finalize() hit a shape error far from the cause.
                raise ValueError(
                    f"node source {si} (type {src.node_type!r}): label "
                    f"column {src.label_column!r} present in only "
                    f"{len(lab_l)} of {len(dense_l)} batches on rank "
                    f"{rank} — every batch of a labeled source must carry "
                    f"the label column")
            arrays = {
                "dense": (np.concatenate(dense_l) if dense_l
                          else np.empty(0, np.int64)),
                "x": (np.concatenate(x_l) if x_l
                      else np.empty((0, 0), np.float32)),
            }
            if lab_l:
                arrays["labels"] = np.concatenate(lab_l)
            _write_npz(sd.join(f"tf_node{si}_r{rank}.npz"), **arrays)
        for si, src in enumerate(self.config.edge_sources()):
            spec = stats = None
            merged_uri = sd.join(f"merged_edge{si}.json")
            if merged_uri.exists():
                spec, stats = TransformSpec.load_stats(merged_uri)
            s_l, d_l, f_l = [], [], []
            for batch in self._sliced(src.batches(), rank, world_size):
                coo = enumerator.enumerate_edges(
                    src.edge_type, batch[src.src_column],
                    batch[src.dst_column])
                s_l.append(coo[0])
                d_l.append(coo[1])
                if spec is not None:
                    f_l.append(spec.apply(stats, batch))
            arrays = {
                "src": (np.concatenate(s_l) if s_l
                        else np.empty(0, np.int64)),
                "dst": (np.concatenate(d_l) if d_l
                        else np.empty(0, np.int64)),
            }
            if f_l:
                arrays["ef"] = np.concatenate(f_l)
            _write_npz(sd.join(f"tf_edge{si}_r{rank}.npz"), **arrays)

    def finalize(self, world_size: int) -> PreprocessedMetadata:
        sd = self._shard_dir()
        enumerator = Enumerator.load(self.output_dir.join("enumeration.npz"))
        meta = PreprocessedMetadata()
        meta.enumerator_uri = str(self.output_dir.join("enumeration.npz"))
        for si, src in enumerate(self.config.node_sources()):
            nt = src.node_type
            emap = enumerator.maps[nt]
            spec, stats = TransformSpec.load_stats(
                sd.join(f"merged_node{si}.json"))
            shard_arrays = [read_npz(sd.join(f"tf_node{si}_r{r}.npz"))
                            for r in range(world_size)]
            # dim from ANY shard that saw rows (rank 0 may have received
            # no batches when world_size exceeds the source's batch count).
            dim = max((a["x"].shape[1] for a in shard_arrays
                       if a["x"].ndim == 2 and a["x"].shape[0]),
                      default=0)
            feats = np.zeros((emap.num_nodes, dim), np.float32)
            labels = None
            for a in shard_arrays:
                dense, x = a["dense"], a["x"]
                if len(dense):
                    feats[dense] = x
                if "labels" in a:
                    if labels is None:
                        labels = np.full(emap.num_nodes, -1, np.int64)
                    labels[dense] = a["labels"]
            feat_uri = self.output_dir.join(f"node_features_{nt}.npz")
            _write_npz(feat_uri, features=feats if feats is not None
                       else np.zeros((emap.num_nodes, 0), np.float32))
            meta.num_nodes[nt] = emap.num_nodes
            meta.node_feature_dim[nt] = int(dim)
            meta.node_feature_uris[nt] = str(feat_uri)
            if labels is not None:
                lab_uri = self.output_dir.join(f"node_labels_{nt}.npz")
                _write_npz(lab_uri, labels=labels)
                meta.node_label_uris[nt] = str(lab_uri)
            stats_uri = self.output_dir.join(
                f"transform_stats_node_{nt}.json")
            spec.save_stats(stats, stats_uri)
            meta.transform_stats_uris[f"node/{nt}"] = str(stats_uri)
        for si, src in enumerate(self.config.edge_sources()):
            et = src.edge_type
            s_l, d_l, f_l = [], [], []
            for r in range(world_size):
                a = read_npz(sd.join(f"tf_edge{si}_r{r}.npz"))
                s_l.append(a["src"])
                d_l.append(a["dst"])
                if "ef" in a:
                    f_l.append(a["ef"])
            edges = np.stack([np.concatenate(s_l), np.concatenate(d_l)])
            uri = self.output_dir.join(f"edges_{et}.npz")
            arrays = {"edges": edges}
            dim = 0
            if f_l:
                ef = np.concatenate(f_l)
                arrays["edge_features"] = ef
                dim = ef.shape[1]
            _write_npz(uri, **arrays)
            meta.edge_uris[str(et)] = str(uri)
            meta.edge_feature_dim[str(et)] = dim
            merged_uri = sd.join(f"merged_edge{si}.json")
            if merged_uri.exists():
                spec, stats = TransformSpec.load_stats(merged_uri)
                stats_uri = self.output_dir.join(
                    f"transform_stats_edge_{et}.json")
                spec.save_stats(stats, stats_uri)
                meta.transform_stats_uris[f"edge/{et}"] = str(stats_uri)
        meta_uri = self.output_dir.join("preprocessed_metadata.yaml")
        meta.save(meta_uri)
        return meta

    def run_sharded(self, world_size: int) -> PreprocessedMetadata:
        """Single-host convenience driver for the 4-phase sharded pipeline
        (workers run as loop iterations; in production each phase-1/3 call
        is its own worker process/pod)."""
        self.config.prepare_for_pipeline()
        for r in range(world_size):
            self.run_analyze_shard(r, world_size)
        self.merge_analysis(world_size)
        for r in range(world_size):
            self.run_transform_shard(r, world_size)
        return self.finalize(world_size)

    # -- per-entity jobs -------------------------------------------------------
    def _process_node_source(self, src: NodeDataSource,
                             enumerator: Enumerator,
                             meta: PreprocessedMetadata) -> None:
        nt = src.node_type
        emap = enumerator.maps[nt]
        spec = self.config.node_transform(nt)
        if spec is None:
            first = next(iter(src.batches()), None)
            feat_cols = [c for c in (first or {})
                         if c not in (src.id_column, src.label_column)]
            from gigl_tpu.data.transform import Identity

            spec = TransformSpec(ops={c: Identity(c) for c in sorted(feat_cols)})
        stats = spec.analyze(src.batches())

        dim = None
        feats = None
        labels = None
        for batch in src.batches():
            dense = emap.to_dense(batch[src.id_column])
            x = spec.apply(stats, batch) if spec.ops else np.zeros(
                (len(dense), 0), np.float32)
            if feats is None:
                dim = x.shape[1]
                feats = np.zeros((emap.num_nodes, dim), np.float32)
            feats[dense] = x
            if src.label_column and src.label_column in batch:
                if labels is None:
                    labels = np.full(emap.num_nodes, -1, np.int64)
                labels[dense] = np.asarray(batch[src.label_column],
                                           np.int64).reshape(-1)
        feat_uri = self.output_dir.join(f"node_features_{nt}.npz")
        _write_npz(feat_uri, features=feats if feats is not None
                   else np.zeros((emap.num_nodes, 0), np.float32))
        meta.num_nodes[nt] = emap.num_nodes
        meta.node_feature_dim[nt] = int(dim or 0)
        meta.node_feature_uris[nt] = str(feat_uri)
        if labels is not None:
            lab_uri = self.output_dir.join(f"node_labels_{nt}.npz")
            _write_npz(lab_uri, labels=labels)
            meta.node_label_uris[nt] = str(lab_uri)
        stats_uri = self.output_dir.join(f"transform_stats_node_{nt}.json")
        spec.save_stats(stats, stats_uri)
        meta.transform_stats_uris[f"node/{nt}"] = str(stats_uri)

    def _process_edge_source(self, src: EdgeDataSource,
                             enumerator: Enumerator,
                             meta: PreprocessedMetadata) -> None:
        et = src.edge_type
        spec = self.config.edge_transform(et)
        srcs, dsts, feats = [], [], []
        stats = spec.analyze(src.batches()) if spec else None
        for batch in src.batches():
            coo = enumerator.enumerate_edges(
                et, batch[src.src_column], batch[src.dst_column])
            srcs.append(coo[0])
            dsts.append(coo[1])
            if spec:
                feats.append(spec.apply(stats, batch))
        edges = np.stack([np.concatenate(srcs), np.concatenate(dsts)])
        uri = self.output_dir.join(f"edges_{et}.npz")
        arrays = {"edges": edges}
        dim = 0
        if feats:
            ef = np.concatenate(feats)
            arrays["edge_features"] = ef
            dim = ef.shape[1]
        _write_npz(uri, **arrays)
        meta.edge_uris[str(et)] = str(uri)
        meta.edge_feature_dim[str(et)] = dim
        if spec:
            stats_uri = self.output_dir.join(f"transform_stats_edge_{et}.json")
            spec.save_stats(stats, stats_uri)
            meta.transform_stats_uris[f"edge/{et}"] = str(stats_uri)


def load_graph_from_metadata(meta: PreprocessedMetadata,
                             graph_metadata: GraphMetadata):
    """Assemble a HeteroGraph from preprocessed outputs (the dataset-build
    entry the trainer uses — ref build_dataset, dataset_factory.py:1-120)."""
    from gigl_tpu.graph.csr import HeteroGraph

    edges = {}
    for et in graph_metadata.edge_types:
        data = read_npz(meta.edge_uris[str(et)])
        edges[et] = data["edges"]
    g = HeteroGraph(
        metadata=graph_metadata,
        num_nodes={nt: meta.num_nodes[nt] for nt in graph_metadata.node_types},
        edges=edges,
    )
    for nt in graph_metadata.node_types:
        if nt in meta.node_feature_uris:
            g.node_features[nt] = read_npz(meta.node_feature_uris[nt])["features"]
        if nt in meta.node_label_uris:
            g.node_labels[nt] = read_npz(meta.node_label_uris[nt])["labels"]
    for et in graph_metadata.edge_types:
        data = read_npz(meta.edge_uris[str(et)])
        if "edge_features" in data:
            g.edge_features[str(et)] = data["edge_features"]
    return g
