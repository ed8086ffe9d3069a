"""GBML wire-format interop tests.

Oracle strategy: the reference's .proto schemas (read-only at
/root/reference/proto) are compiled with protoc into a temp dir at test time
and the generated messages are used ONLY as a serialization oracle — our
hand-rolled codec must byte-interoperate with real protobuf. Skipped cleanly
when protoc / the reference tree is unavailable (e.g. on an end-user
install), in which case the pure round-trip tests still run.
"""

import os
import shutil
import subprocess
import sys
import tempfile

import numpy as np
import pytest

from gigl_tpu.config.gbml_import import (
    task_config_from_gbml_dict,
    task_config_from_gbml_yaml,
)
from gigl_tpu.data import gbml
from gigl_tpu.types.graph import EdgeType, GraphMetadata
from gigl_tpu.types.task import TaskMetadataType

_REF_PROTO_DIR = "/root/reference/proto"


@pytest.fixture(scope="module")
def oracle():
    """protoc-compiled reference schema modules (or skip)."""
    if shutil.which("protoc") is None or not os.path.isdir(_REF_PROTO_DIR):
        pytest.skip("protoc or reference protos unavailable")
    tmp = tempfile.mkdtemp(prefix="gbml_pb_")
    files = [
        f"{_REF_PROTO_DIR}/snapchat/research/gbml/graph_schema.proto",
        f"{_REF_PROTO_DIR}/snapchat/research/gbml/training_samples_schema.proto",
    ]
    res = subprocess.run(
        ["protoc", "-I", _REF_PROTO_DIR, f"--python_out={tmp}"] + files,
        capture_output=True,
    )
    if res.returncode != 0:
        pytest.skip(f"protoc failed: {res.stderr.decode()[:200]}")
    sys.path.insert(0, tmp)
    try:
        from snapchat.research.gbml import (  # noqa: PLC0415
            graph_schema_pb2,
            training_samples_schema_pb2,
        )
    except ImportError as e:  # pragma: no cover
        pytest.skip(f"generated pb2 import failed: {e}")
    yield graph_schema_pb2, training_samples_schema_pb2
    sys.path.remove(tmp)


def _oracle_nalp_sample(ts, gs):
    s = ts.NodeAnchorBasedLinkPredictionSample()
    s.root_node.node_id = 3
    s.root_node.condensed_node_type = 0
    s.root_node.feature_values.extend([0.5, 1.5])
    for dst in (7, 9):
        e = s.pos_edges.add()
        e.src_node_id, e.dst_node_id, e.condensed_edge_type = 3, dst, 0
        e.feature_values.extend([2.0])
    hn = s.hard_neg_edges.add()
    hn.src_node_id, hn.dst_node_id, hn.condensed_edge_type = 3, 11, 0
    for nid in (3, 7, 9):
        n = s.neighborhood.nodes.add()
        n.node_id = nid
        n.feature_values.extend([float(nid), -float(nid)])
    for src, dst in ((7, 3), (9, 7)):
        e = s.neighborhood.edges.add()
        e.src_node_id, e.dst_node_id = src, dst
    return s


class TestWireOracle:
    def test_node_decode_matches_oracle(self, oracle):
        gs, _ = oracle
        n = gs.Node(node_id=42, condensed_node_type=3,
                    feature_values=[1.5, -2.25, 0.0])
        ours = gbml.GbmlNode.decode(n.SerializeToString())
        assert ours.node_id == 42
        assert ours.condensed_node_type == 3
        np.testing.assert_array_equal(
            ours.feature_values, np.array([1.5, -2.25, 0.0], np.float32))

    def test_node_encode_parses_in_oracle(self, oracle):
        gs, _ = oracle
        ours = gbml.GbmlNode(node_id=7, condensed_node_type=1,
                             feature_values=np.array([3.5], np.float32))
        n = gs.Node()
        n.ParseFromString(ours.encode())
        assert n.node_id == 7
        assert n.condensed_node_type == 1
        assert list(n.feature_values) == [3.5]

    def test_optional_absent_scalar(self, oracle):
        gs, _ = oracle
        n = gs.Node(node_id=1)  # no condensed type, no features
        ours = gbml.GbmlNode.decode(n.SerializeToString())
        assert ours.condensed_node_type is None
        assert len(ours.feature_values) == 0

    def test_edge_roundtrip(self, oracle):
        gs, _ = oracle
        e = gs.Edge(src_node_id=5, dst_node_id=6, condensed_edge_type=2,
                    feature_values=[0.25, 8.0])
        ours = gbml.GbmlEdge.decode(e.SerializeToString())
        assert (ours.src_node_id, ours.dst_node_id) == (5, 6)
        assert ours.condensed_edge_type == 2
        back = gs.Edge()
        back.ParseFromString(ours.encode())
        assert back == e

    def test_nalp_sample_decode(self, oracle):
        gs, ts = oracle
        s = _oracle_nalp_sample(ts, gs)
        ours = gbml.NodeAnchorBasedLinkPredictionSamplePb.decode(
            s.SerializeToString())
        assert ours.root_node.node_id == 3
        assert [(e.src_node_id, e.dst_node_id) for e in ours.pos_edges] == [
            (3, 7), (3, 9)]
        assert [(e.src_node_id, e.dst_node_id) for e in ours.hard_neg_edges
                ] == [(3, 11)]
        assert len(ours.neighborhood.nodes) == 3
        assert len(ours.neighborhood.edges) == 2
        np.testing.assert_array_equal(
            ours.neighborhood.nodes[1].feature_values,
            np.array([7.0, -7.0], np.float32))

    def test_nalp_sample_encode_parses_in_oracle(self, oracle):
        gs, ts = oracle
        ours = gbml.NodeAnchorBasedLinkPredictionSamplePb(
            root_node=gbml.GbmlNode(node_id=3, condensed_node_type=0,
                                    feature_values=np.array([0.5], np.float32)),
            pos_edges=[gbml.GbmlEdge(3, 7, condensed_edge_type=0)],
            hard_neg_edges=[gbml.GbmlEdge(3, 11, condensed_edge_type=0)],
            neighborhood=gbml.GbmlGraph(
                nodes=[gbml.GbmlNode(node_id=3), gbml.GbmlNode(node_id=7)],
                edges=[gbml.GbmlEdge(7, 3)]),
        )
        s = ts.NodeAnchorBasedLinkPredictionSample()
        s.ParseFromString(ours.encode())
        assert s.root_node.node_id == 3
        assert s.pos_edges[0].dst_node_id == 7
        assert s.hard_neg_edges[0].dst_node_id == 11
        assert len(s.neighborhood.nodes) == 2
        assert s.neighborhood.edges[0].src_node_id == 7

    def test_rooted_neighborhood_and_classification(self, oracle):
        gs, ts = oracle
        r = ts.RootedNodeNeighborhood()
        r.root_node.node_id = 12
        n = r.neighborhood.nodes.add()
        n.node_id = 12
        ours = gbml.RootedNodeNeighborhoodPb.decode(r.SerializeToString())
        assert ours.root_node.node_id == 12
        assert ours.neighborhood.nodes[0].node_id == 12

        c = ts.SupervisedNodeClassificationSample()
        c.root_node.node_id = 5
        lbl = c.root_node_labels.add()
        lbl.label_type, lbl.label = "cls", -3  # negative int32 varint
        ours_c = gbml.SupervisedNodeClassificationSamplePb.decode(
            c.SerializeToString())
        assert ours_c.root_node_labels[0].label == -3
        assert ours_c.root_node_labels[0].label_type == "cls"
        back = ts.SupervisedNodeClassificationSample()
        back.ParseFromString(ours_c.encode())
        assert back.root_node_labels[0].label == -3

    def test_link_based_sample(self, oracle):
        gs, ts = oracle
        s = ts.SupervisedLinkBasedTaskSample()
        s.root_edge.src_node_id, s.root_edge.dst_node_id = 1, 2
        lbl = s.root_edge_labels.add()
        lbl.label_type, lbl.label = "view", 1
        ours = gbml.SupervisedLinkBasedTaskSamplePb.decode(
            s.SerializeToString())
        assert (ours.root_edge.src_node_id, ours.root_edge.dst_node_id) == (1, 2)
        assert ours.root_edge_labels[0].label == 1

    def test_graph_metadata_roundtrip(self, oracle):
        gs, _ = oracle
        md = GraphMetadata(
            node_types=("user", "story"),
            edge_types=(EdgeType("user", "views", "story"),),
        )
        pb = gs.GraphMetadata()
        pb.ParseFromString(gbml.encode_graph_metadata(md))
        assert list(pb.node_types) == ["user", "story"]
        assert pb.edge_types[0].relation == "views"
        assert pb.condensed_node_type_map[0] == "story"  # sorted assignment
        back = gbml.decode_graph_metadata(pb.SerializeToString())
        assert back == md

    def test_unpacked_repeated_floats_accepted(self, oracle):
        # proto3 parsers must accept unpacked encoding of packed fields;
        # hand-build an unpacked repeated-float Node (field 3, wire 5).
        import struct
        buf = b"\x08\x01" + b"".join(
            b"\x1d" + struct.pack("<f", v) for v in (1.0, 2.0))
        ours = gbml.GbmlNode.decode(buf)
        np.testing.assert_array_equal(
            ours.feature_values, np.array([1.0, 2.0], np.float32))


class TestConverters:
    def _samples(self):
        mk_edge = lambda s, d: gbml.GbmlEdge(s, d, condensed_edge_type=0)
        mk_node = lambda i: gbml.GbmlNode(
            node_id=i, condensed_node_type=0,
            feature_values=np.array([float(i), 1.0], np.float32))
        return [
            gbml.NodeAnchorBasedLinkPredictionSamplePb(
                root_node=mk_node(0),
                pos_edges=[mk_edge(0, 1)],
                hard_neg_edges=[mk_edge(0, 3)],
                neighborhood=gbml.GbmlGraph(
                    nodes=[mk_node(0), mk_node(1), mk_node(2)],
                    edges=[mk_edge(1, 0), mk_edge(2, 1)]),
            ),
            gbml.NodeAnchorBasedLinkPredictionSamplePb(
                root_node=mk_node(1),
                pos_edges=[mk_edge(1, 2)],
                neighborhood=gbml.GbmlGraph(
                    nodes=[mk_node(1), mk_node(2)],
                    edges=[mk_edge(2, 1)]),  # duplicate edge, must dedup
            ),
        ]

    def test_hetero_graph_from_samples(self):
        g, _ = gbml.hetero_graph_from_samples(self._samples())
        et = g.metadata.edge_types[0]
        nt = g.metadata.node_types[0]
        # node 3 appears only as hard-neg endpoint -> counted in num_nodes
        assert g.num_nodes[nt] == 4
        edges = set(map(tuple, g.edges[et].T))
        # structural edges: neighborhood + pos edges, deduped
        assert edges == {(1, 0), (2, 1), (0, 1), (1, 2)}
        assert g.node_features[str(nt)].shape == (4, 2)
        np.testing.assert_allclose(g.node_features[str(nt)][2], [2.0, 1.0])
        # node 3 never carried features -> zero row
        np.testing.assert_allclose(g.node_features[str(nt)][3], [0.0, 0.0])

    def test_nalp_supervision_from_samples(self):
        sup = gbml.nalp_supervision_from_samples(self._samples())
        et = next(iter(sup))
        np.testing.assert_array_equal(sup[et]["anchors"], [0, 1])
        assert set(map(tuple, sup[et]["pos_edges"].T)) == {(0, 1), (1, 2)}
        assert set(map(tuple, sup[et]["hard_neg_edges"].T)) == {(0, 3)}

    def test_classification_labels(self):
        s = gbml.SupervisedNodeClassificationSamplePb(
            root_node=gbml.GbmlNode(node_id=2, condensed_node_type=0),
            neighborhood=gbml.GbmlGraph(nodes=[gbml.GbmlNode(node_id=2)]),
            root_node_labels=[gbml.GbmlLabel("cls", 5)],
        )
        g, labels = gbml.hetero_graph_from_samples([s])
        nt = str(g.metadata.node_types[0])
        assert labels[nt][2] == 5
        assert (labels[nt][:2] == -1).all()

    def test_tfrecord_sample_file_roundtrip(self, tmp_path):
        path = str(tmp_path / "samples.tfrecord")
        n = gbml.write_samples(path, self._samples())
        assert n == 2
        back = list(gbml.read_samples(
            path, gbml.NodeAnchorBasedLinkPredictionSamplePb))
        assert [s.root_node.node_id for s in back] == [0, 1]
        assert back[0].pos_edges[0].dst_node_id == 1

    def test_sampled_blocks_export(self):
        import jax.numpy as jnp

        from gigl_tpu.graph.csr import HeteroGraph
        from gigl_tpu.sampling.neighbor_sampler import (
            DeviceCSR,
            sample_blocks,
        )

        rng = np.random.default_rng(0)
        src = rng.integers(0, 50, 300)
        dst = rng.integers(0, 50, 300)
        g = HeteroGraph.homogeneous(src=src, dst=dst, num_nodes=50)
        csr = DeviceCSR.from_csr(g.csr(g.metadata.edge_types[0], "dst"))
        blocks = sample_blocks(csr, jnp.arange(4, dtype=jnp.int32), (3, 2))
        feats = rng.normal(size=(50, 4)).astype(np.float32)
        protos = gbml.sampled_blocks_to_rooted_neighborhoods(
            blocks, feats, condensed_node_type=0, condensed_edge_type=0)
        assert len(protos) == 4
        in_edges = set(zip(src.tolist(), dst.tolist()))
        for b, p in enumerate(protos):
            assert p.root_node.node_id == b
            ids = {n.node_id for n in p.neighborhood.nodes}
            assert b in ids
            for e in p.neighborhood.edges:
                # INCOMING: sampled edge (src=neighbor, dst=parent) must be a
                # real edge of the graph
                assert (e.src_node_id, e.dst_node_id) in in_edges
                assert e.src_node_id in ids and e.dst_node_id in ids
            for n in p.neighborhood.nodes:
                np.testing.assert_allclose(n.feature_values, feats[n.node_id])

    def test_export_decodes_in_oracle(self, oracle, tmp_path):
        _, ts = oracle
        import jax.numpy as jnp

        from gigl_tpu.graph.csr import HeteroGraph
        from gigl_tpu.sampling.neighbor_sampler import (
            DeviceCSR,
            sample_blocks,
        )

        g = HeteroGraph.homogeneous(
            src=np.array([1, 2, 3]), dst=np.array([0, 0, 1]), num_nodes=4)
        csr = DeviceCSR.from_csr(g.csr(g.metadata.edge_types[0], "dst"))
        blocks = sample_blocks(csr, jnp.array([0], jnp.int32), (2,))
        protos = gbml.sampled_blocks_to_rooted_neighborhoods(blocks)
        path = str(tmp_path / "rnn.tfrecord")
        gbml.write_samples(path, protos)
        from gigl_tpu import native
        payloads = list(native.tfrecord_read(path))
        parsed = ts.RootedNodeNeighborhood()
        parsed.ParseFromString(payloads[0])
        assert parsed.root_node.node_id == 0
        assert all(e.dst_node_id == 0 for e in parsed.neighborhood.edges)


class TestConfigImport:
    _MAG_STYLE = {
        "graphMetadata": {
            "nodeTypes": ["paper_or_author"],
            "edgeTypes": [{
                "srcNodeType": "paper_or_author", "relation": "references",
                "dstNodeType": "paper_or_author"}],
        },
        "taskMetadata": {
            "nodeAnchorBasedLinkPredictionTaskMetadata": {
                "supervisionEdgeTypes": [{
                    "srcNodeType": "paper_or_author",
                    "relation": "references",
                    "dstNodeType": "paper_or_author"}]}},
        "sharedConfig": {"isGraphDirected": True},
        "datasetConfig": {
            "dataPreprocessorConfig": {
                "dataPreprocessorConfigClsPath": "my.Preprocessor"},
            "subgraphSamplerConfig": {
                "numHops": 2, "numNeighborsToSample": 15,
                "numUserDefinedPositiveSamples": 1},
            "splitGeneratorConfig": {
                "assignerArgs": {"seed": "42", "train_split": "0.7",
                                 "val_split": "0.1", "test_split": "0.2"},
                "assignerClsPath": "splitgenerator.lib.assigners."
                    "UserDefinedLabelsEdgeToLinkSplitHashingAssigner",
                "splitStrategyClsPath": "splitgenerator.lib.split_strategies."
                    "UserDefinedLabelsNodeAnchorBasedLinkPredictionSplitStrategy",
            }},
        "trainerConfig": {
            "trainerClsPath": "gigl.src.common.modeling_task_specs."
                "NodeAnchorBasedLinkPredictionModelingTaskSpec",
            "trainerArgs": {"main_sample_batch_size": "512"}},
        "inferencerConfig": {
            "inferencerClsPath": "gigl.src.common.modeling_task_specs."
                "NodeAnchorBasedLinkPredictionModelingTaskSpec"},
        "featureFlags": {"should_run_glt_backend": "True"},
    }

    def test_mag_style_import(self):
        cfg = task_config_from_gbml_dict(self._MAG_STYLE)
        assert cfg.task_metadata.task_type is (
            TaskMetadataType.NODE_ANCHOR_BASED_LINK_PREDICTION_TASK)
        assert cfg.graph_metadata.node_types == ("paper_or_author",)
        assert cfg.dataset.sampling.fanouts == (15, 15)
        assert cfg.dataset.num_positive_samples == 1
        assert cfg.dataset.split.strategy == "udl_edge"
        assert cfg.dataset.split.train_ratio == 0.7
        assert cfg.dataset.split.seed == 42
        assert cfg.trainer.trainer_cls_path == (
            "gigl_tpu.training.task_specs.NodeAnchorLinkPredictionTaskSpec")
        assert cfg.trainer.trainer_args["main_sample_batch_size"] == "512"
        assert cfg.inferencer.inferencer_cls_path == (
            "gigl_tpu.training.task_specs.NodeAnchorLinkPredictionTaskSpec")
        assert cfg.feature_flags["is_graph_directed"] == "True"

    def test_reference_example_yaml_imports(self):
        path = "/root/reference/examples/MAG240M/task_config.yaml"
        if not os.path.exists(path):
            pytest.skip("reference example unavailable")
        cfg = task_config_from_gbml_yaml(path)
        assert cfg.dataset.sampling.fanouts == (15, 15)
        assert cfg.graph_metadata.node_types == ("paper_or_author",)

    def test_message_passing_paths_import(self):
        d = {
            "graphMetadata": {
                "nodeTypes": ["user", "story"],
                "edgeTypes": [
                    {"srcNodeType": "user", "relation": "views",
                     "dstNodeType": "story"},
                    {"srcNodeType": "story", "relation": "viewed_by",
                     "dstNodeType": "user"}],
            },
            "taskMetadata": {"nodeBasedTaskMetadata": {
                "supervisionNodeTypes": ["user"]}},
            "datasetConfig": {"subgraphSamplerConfig": {
                "subgraphSamplingStrategy": {"messagePassingPaths": {
                    "paths": [{
                        "rootNodeType": "user",
                        "samplingOps": [
                            {"opName": "hop1",
                             "edgeType": {"srcNodeType": "story",
                                          "relation": "viewed_by",
                                          "dstNodeType": "user"},
                             "randomUniform": {"numNodesToSample": 5},
                             "samplingDirection": "INCOMING"},
                            {"opName": "hop2",
                             "edgeType": {"srcNodeType": "user",
                                          "relation": "views",
                                          "dstNodeType": "story"},
                             "inputOpNames": ["hop1"],
                             "randomWeighted": {"numNodesToSample": 3,
                                                "edgeFeatName": "w"},
                             "samplingDirection": "INCOMING"},
                        ]}]}}}},
        }
        cfg = task_config_from_gbml_dict(d)
        paths = cfg.dataset.sampling.message_passing_paths
        assert set(paths) == {"user"}
        ops = paths["user"]
        assert ops[0].sampling_method == "uniform"
        assert ops[0].num_nodes_to_sample == 5
        assert ops[1].sampling_method == "weighted"
        assert ops[1].input_op_names == ("hop1",)
        # resolves against the hetero sampler's DAG validation
        from gigl_tpu.sampling.hetero_sampler import resolve_path
        spec = resolve_path("user", ops)
        assert [s.fanout for s in spec] == [5, 3]

    def test_user_defined_op_rejected(self):
        d = dict(self._MAG_STYLE)
        d = {**d, "datasetConfig": {"subgraphSamplerConfig": {
            "subgraphSamplingStrategy": {"messagePassingPaths": {"paths": [{
                "rootNodeType": "paper_or_author",
                "samplingOps": [{
                    "opName": "x",
                    "edgeType": {"srcNodeType": "paper_or_author",
                                 "relation": "references",
                                 "dstNodeType": "paper_or_author"},
                    "userDefined": {"pathToUdf": "my.Filter"}}]}]}}}}}
        with pytest.raises(ValueError, match="userDefined"):
            task_config_from_gbml_dict(d)

    def test_not_a_gbml_config(self):
        with pytest.raises(ValueError, match="GbmlConfig"):
            task_config_from_gbml_dict({"foo": 1})


class TestSampleValidation:
    """TaskOutputValidator parity (TaskOutputValidator.scala:29-113)."""

    def _valid_sample(self):
        nodes = [gbml.GbmlNode(node_id=i, condensed_node_type=0)
                 for i in (0, 1, 2)]
        return gbml.NodeAnchorBasedLinkPredictionSamplePb(
            root_node=nodes[0],
            pos_edges=[gbml.GbmlEdge(0, 1, condensed_edge_type=0)],
            hard_neg_edges=[gbml.GbmlEdge(0, 2, condensed_edge_type=0)],
            neighborhood=gbml.GbmlGraph(
                nodes=nodes, edges=[gbml.GbmlEdge(1, 0, 0),
                                    gbml.GbmlEdge(2, 1, 0)]),
        )

    def test_valid_passes(self):
        assert gbml.validate_samples([self._valid_sample()]) == 1

    def test_dangling_supervision_edge_fails(self):
        s = self._valid_sample()
        s.pos_edges.append(gbml.GbmlEdge(0, 99, condensed_edge_type=0))
        with pytest.raises(ValueError, match="99"):
            gbml.validate_samples([s])

    def test_dangling_neighborhood_edge_fails(self):
        s = self._valid_sample()
        s.neighborhood.edges.append(gbml.GbmlEdge(42, 0, 0))
        with pytest.raises(ValueError, match="42"):
            gbml.validate_samples([s])

    def test_typed_endpoint_mismatch_fails(self):
        md = GraphMetadata(node_types=("user", "item"),
                           edge_types=(EdgeType("user", "buys", "item"),))
        # neighborhood holds node 1 as an *item*; an edge claiming node 1 as
        # its user-typed src endpoint must fail (typed-endpoint check).
        item_cnt = {str(v): k for k, v in
                    md.condensed_node_type_map.items()}["item"]
        s = gbml.RootedNodeNeighborhoodPb(
            root_node=gbml.GbmlNode(node_id=1,
                                    condensed_node_type=item_cnt),
            neighborhood=gbml.GbmlGraph(
                nodes=[gbml.GbmlNode(node_id=1,
                                     condensed_node_type=item_cnt)],
                edges=[gbml.GbmlEdge(1, 1, condensed_edge_type=0)]),
        )
        with pytest.raises(ValueError, match="not present"):
            gbml.validate_samples([s], md)

    def test_exported_blocks_validate(self):
        import jax.numpy as jnp

        from gigl_tpu.graph.csr import HeteroGraph
        from gigl_tpu.sampling.neighbor_sampler import (
            DeviceCSR,
            sample_blocks,
        )

        rng = np.random.default_rng(1)
        src = rng.integers(0, 40, 200)
        dst = rng.integers(0, 40, 200)
        g = HeteroGraph.homogeneous(src=src, dst=dst, num_nodes=40)
        csr = DeviceCSR.from_csr(g.csr(g.metadata.edge_types[0], "dst"))
        blocks = sample_blocks(csr, jnp.arange(8, dtype=jnp.int32), (4, 3))
        protos = gbml.sampled_blocks_to_rooted_neighborhoods(
            blocks, condensed_node_type=0, condensed_edge_type=0)
        assert gbml.validate_samples(protos) == 8


class TestConfigExportRoundTrip:
    def _cfg(self, **kw):
        from gigl_tpu.config.task_config import (
            DatasetConfig,
            SplitConfig,
            SubgraphSamplingStrategy,
            TaskConfig,
            TrainerConfig,
        )
        from gigl_tpu.types.task import TaskMetadata

        gm = GraphMetadata(
            node_types=("user", "item"),
            edge_types=(EdgeType("user", "buys", "item"),
                        EdgeType("item", "rev_buys", "user")))
        return TaskConfig(
            graph_metadata=gm,
            task_metadata=TaskMetadata(
                task_type=TaskMetadataType.NODE_ANCHOR_BASED_LINK_PREDICTION_TASK,
                supervision_edge_types=(EdgeType("user", "buys", "item"),)),
            dataset=DatasetConfig(
                sampling=SubgraphSamplingStrategy(**kw.get("sampling", {"fanouts": (15, 15)})),
                num_positive_samples=2,
                split=SplitConfig(train_ratio=0.7, val_ratio=0.1, seed=7,
                                  strategy="udl_edge")),
            trainer=TrainerConfig(
                trainer_cls_path="gigl_tpu.training.task_specs."
                                 "NodeAnchorLinkPredictionTaskSpec",
                trainer_args={"hid_dim": "64"}),
        )

    def test_round_trip_flat_fanouts(self):
        from gigl_tpu.config.gbml_export import task_config_to_gbml_dict
        from gigl_tpu.config.gbml_import import task_config_from_gbml_dict

        cfg = self._cfg()
        d = task_config_to_gbml_dict(cfg)
        assert d["datasetConfig"]["subgraphSamplerConfig"]["numHops"] == 2
        back = task_config_from_gbml_dict(d)
        assert back.graph_metadata == cfg.graph_metadata
        assert back.task_metadata == cfg.task_metadata
        assert back.dataset.sampling.fanouts == (15, 15)
        assert back.dataset.num_positive_samples == 2
        assert back.dataset.split.strategy == "udl_edge"
        assert back.dataset.split.train_ratio == 0.7
        assert back.dataset.split.seed == 7
        assert back.trainer.trainer_cls_path == cfg.trainer.trainer_cls_path
        assert back.trainer.trainer_args == {"hid_dim": "64"}

    def test_round_trip_mixed_fanouts_via_dag(self):
        from gigl_tpu.config.gbml_export import task_config_to_gbml_dict
        from gigl_tpu.config.gbml_import import task_config_from_gbml_dict

        cfg = self._cfg(sampling={"fanouts": (15, 10)})
        d = task_config_to_gbml_dict(cfg)
        sgs = d["datasetConfig"]["subgraphSamplerConfig"]
        assert "subgraphSamplingStrategy" in sgs
        back = task_config_from_gbml_dict(d)
        ops = next(iter(back.dataset.sampling.message_passing_paths.values()))
        assert [op.num_nodes_to_sample for op in ops] == [15, 10]

    def test_round_trip_dag_paths(self):
        from gigl_tpu.config.gbml_export import task_config_to_gbml_dict
        from gigl_tpu.config.gbml_import import task_config_from_gbml_dict
        from gigl_tpu.config.task_config import SamplingOp

        ops = [
            SamplingOp(op_name="h1",
                       edge_type=EdgeType("item", "rev_buys", "user"),
                       num_nodes_to_sample=5,
                       sampling_direction="INCOMING"),
            SamplingOp(op_name="h2",
                       edge_type=EdgeType("user", "buys", "item"),
                       num_nodes_to_sample=3, input_op_names=("h1",),
                       sampling_method="top_k",
                       sampling_direction="INCOMING"),
        ]
        cfg = self._cfg(sampling={"message_passing_paths": {"user": ops}})
        back = task_config_from_gbml_dict(task_config_to_gbml_dict(cfg))
        bops = back.dataset.sampling.message_passing_paths["user"]
        assert [o.op_name for o in bops] == ["h1", "h2"]
        assert bops[1].sampling_method == "top_k"
        assert bops[1].input_op_names == ("h1",)

    def test_exported_yaml_parses_against_saved_file(self, tmp_path):
        from gigl_tpu.config.gbml_export import save_task_config_as_gbml_yaml
        from gigl_tpu.config.gbml_import import task_config_from_gbml_yaml

        cfg = self._cfg()
        p = str(tmp_path / "exported.yaml")
        save_task_config_as_gbml_yaml(cfg, p)
        back = task_config_from_gbml_yaml(p)
        assert back.graph_metadata == cfg.graph_metadata

    def test_export_parses_in_reference_proto(self, tmp_path):
        """The exported dict must ParseDict into the actual GbmlConfig
        proto (protoc-oracle: the real wire contract, not just our own
        importer)."""
        if shutil.which("protoc") is None or not os.path.isdir(_REF_PROTO_DIR):
            pytest.skip("protoc or reference protos unavailable")
        import glob
        import subprocess as sp

        out = str(tmp_path / "pb")
        os.makedirs(out)
        files = glob.glob(
            f"{_REF_PROTO_DIR}/snapchat/research/gbml/*.proto")
        res = sp.run(["protoc", "-I", _REF_PROTO_DIR,
                      f"--python_out={out}"] + files, capture_output=True)
        if res.returncode != 0:
            pytest.skip(f"protoc failed: {res.stderr.decode()[:200]}")
        sys.path.insert(0, out)
        try:
            from google.protobuf.json_format import ParseDict
            from snapchat.research.gbml import gbml_config_pb2

            from gigl_tpu.config.gbml_export import task_config_to_gbml_dict

            cfg = self._cfg()
            pb = ParseDict(task_config_to_gbml_dict(cfg),
                           gbml_config_pb2.GbmlConfig())
            assert pb.task_metadata.WhichOneof("task_metadata") == (
                "node_anchor_based_link_prediction_task_metadata")
            assert pb.graph_metadata.node_types[0] == "user"
            assert (pb.dataset_config.subgraph_sampler_config
                    .num_positive_samples == 2)
        finally:
            sys.path.remove(out)
