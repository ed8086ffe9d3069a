"""Materialized rooted-neighborhood artifacts: determinism parity with the
live device sampler + pipeline feature-flag integration (ref SGS
RootedNodeNeighborhood TFRecord outputs + weighted/top-k sampling ops)."""

import jax.numpy as jnp
import numpy as np
import pytest

from gigl_tpu import native
from gigl_tpu.config.task_config import SamplingOp
from gigl_tpu.data.mocking import TOY_GRAPH_NODE_ANCHOR_LP, get_mocked_graph
from gigl_tpu.sampling.materialize import (
    materialize_rooted_neighborhoods,
    read_rooted_neighborhoods,
)
from gigl_tpu.training.dataset import DeviceGraph

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable")


@pytest.fixture(scope="module")
def device_graph():
    g = get_mocked_graph(TOY_GRAPH_NODE_ANCHOR_LP)
    return DeviceGraph.from_hetero(g)


class TestMaterialization:
    def test_covers_all_nodes_and_matches_live_sampler(self, device_graph,
                                                       tmp_path_factory):
        out = str(tmp_path_factory.mktemp("mat"))
        shards = materialize_rooted_neighborhoods(
            device_graph, out, fanouts=(4, 3), seed=11, batch_size=32,
            rows_per_shard=50)
        assert len(shards) >= 2  # 128 nodes / 50 rows per shard
        rows = list(read_rooted_neighborhoods(out))
        assert len(rows) == device_graph.num_nodes
        assert sorted(r[0] for r in rows) == list(
            range(device_graph.num_nodes))
        # Determinism: stored == freshly sampled (same seed+fanouts).
        root_id, fanouts, hop_ids, hop_masks = rows[17]
        blocks = device_graph.sample_hop_blocks(
            jnp.asarray([root_id], jnp.int32), fanouts, seed=11)
        for h in range(len(fanouts)):
            np.testing.assert_array_equal(
                hop_ids[h], np.asarray(blocks.node_ids[h + 1])[0])
            np.testing.assert_array_equal(
                hop_masks[h], np.asarray(blocks.masks[h + 1])[0])

    def test_pipeline_feature_flag(self, tmp_path):
        import yaml

        from gigl_tpu.data.mocking import (
            MockedPreprocessorConfig,
            mocked_task_config,
        )
        from gigl_tpu.data.uri import UriFactory
        from gigl_tpu.orchestration.runner import (
            Component,
            PipelineConfig,
            Runner,
        )

        g = get_mocked_graph(TOY_GRAPH_NODE_ANCHOR_LP)
        cfg = mocked_task_config(TOY_GRAPH_NODE_ANCHOR_LP)
        cfg.feature_flags["should_materialize_subgraphs"] = "true"
        template = str(tmp_path / "t.yaml")
        cfg.save(template)
        runner = Runner(PipelineConfig(
            job_name="mat", template_task_config_uri=template,
            working_dir=str(tmp_path),
            data_preprocessor_config=MockedPreprocessorConfig(g)))
        frozen = runner.run(stop_after=Component.SUBGRAPH_SAMPLER)
        manifest = yaml.safe_load(UriFactory.create(
            frozen.shared.flattened_graph_metadata_uri).read_text())
        assert manifest["backend"] == "materialized_tabularized"
        assert len(manifest["rooted_neighborhood_shards"]) >= 1


class TestWeightedSamplingOps:
    def test_top_k_op_selects_heaviest_edges(self):
        """SamplingOp(method=top_k) over an edge type with weight features
        must pick the highest-weight neighbors."""
        from gigl_tpu.graph.csr import HeteroGraph
        from gigl_tpu.sampling.hetero_sampler import resolve_path
        from gigl_tpu.training.hetero_dataset import HeteroDeviceGraph
        from gigl_tpu.types.graph import (
            DEFAULT_HOMOGENEOUS_EDGE_TYPE as ET,
        )

        # Node 0 has 5 in-edges with weights 1..5 from nodes 1..5.
        src = np.array([1, 2, 3, 4, 5])
        dst = np.array([0, 0, 0, 0, 0])
        g = HeteroGraph.homogeneous(src=src, dst=dst, num_nodes=6)
        g.edge_features[str(ET)] = np.asarray(
            [[1.0], [2.0], [3.0], [4.0], [5.0]], np.float32)
        spec = resolve_path("default", [SamplingOp(
            op_name="h1", edge_type=ET, num_nodes_to_sample=2,
            sampling_method="top_k")])
        dg = HeteroDeviceGraph.from_hetero(g, {"default": spec})
        blocks = dg.sample(jnp.asarray([0], jnp.int32), "default", spec)
        picked = set(np.asarray(blocks.node_ids[1])[0].tolist())
        assert picked == {4, 5}  # weights 4.0 and 5.0

    def test_weighted_requires_edge_features(self):
        from gigl_tpu.graph.csr import HeteroGraph
        from gigl_tpu.sampling.hetero_sampler import resolve_path
        from gigl_tpu.training.hetero_dataset import HeteroDeviceGraph
        from gigl_tpu.types.graph import (
            DEFAULT_HOMOGENEOUS_EDGE_TYPE as ET,
        )

        g = HeteroGraph.homogeneous(
            src=np.array([1]), dst=np.array([0]), num_nodes=2)
        spec = resolve_path("default", [SamplingOp(
            op_name="h1", edge_type=ET, num_nodes_to_sample=2,
            sampling_method="weighted")])
        with pytest.raises(ValueError, match="no edge features"):
            HeteroDeviceGraph.from_hetero(g, {"default": spec})
