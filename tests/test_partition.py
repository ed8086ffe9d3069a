"""Partition books, graph partitioning, and sharded-feature training
(halo exchange via XLA collectives) on the virtual 8-device CPU mesh.

Ref test model: unit/distributed/distributed_partitioner_test.py (partition
books, per-entity partition fns) — without the RPC fake-cluster, since
placement here is jax.sharding, validated by running the jitted step on a
mesh and comparing numerics against the replicated run."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gigl_tpu.parallel.mesh import make_mesh, put_replicated
from gigl_tpu.parallel.partition import (
    GraphPartition,
    PartitionBook,
    minimal_uint_dtype,
    partition_edges,
    partition_graph,
    shard_features_rowwise,
    shard_graph_features,
)


class TestPartitionBook:
    def test_dtype_minimized(self):
        assert minimal_uint_dtype(2) == np.uint8
        assert minimal_uint_dtype(256) == np.uint8
        assert minimal_uint_dtype(257) == np.uint16
        assert minimal_uint_dtype(70000) == np.uint32

    def test_range_partition_balanced(self):
        pb = PartitionBook.by_range(100, 8)
        sizes = [len(pb.ids_of_shard(s)) for s in range(8)]
        assert sum(sizes) == 100
        assert max(sizes) - min(sizes) <= 13  # ceil(100/8)=13

    def test_shard_of_roundtrip(self):
        pb = PartitionBook.by_range(50, 4)
        for s in range(4):
            ids = pb.ids_of_shard(s)
            assert (pb.shard_of(ids) == s).all()

    def test_hash_partition(self):
        h = np.arange(1000) * 2654435761 % (2 ** 31)
        pb = PartitionBook.by_hash(h, 3)
        assert set(np.unique(pb.book)) <= {0, 1, 2}


class TestPartitionGraph:
    def test_edges_colocated_with_anchor(self):
        rng = np.random.default_rng(0)
        edges = np.stack([rng.integers(0, 40, 500),
                          rng.integers(0, 40, 500)])
        book, parts = partition_graph(edges, 40, 4, edge_dir="in")
        for p in parts:
            # every edge's dst is owned by this shard
            assert (book.shard_of(p.edges[1]) == p.shard).all()
        assert sum(p.edges.shape[1] for p in parts) == 500

    def test_edge_dir_out(self):
        edges = np.array([[0, 1, 2, 3], [3, 2, 1, 0]])
        book, parts = partition_graph(edges, 4, 2, edge_dir="out")
        for p in parts:
            assert (book.shard_of(p.edges[0]) == p.shard).all()

    def test_features_follow_nodes(self):
        rng = np.random.default_rng(1)
        feats = rng.normal(size=(30, 5)).astype(np.float32)
        edges = np.stack([rng.integers(0, 30, 100),
                          rng.integers(0, 30, 100)])
        book, parts = partition_graph(edges, 30, 3, node_features=feats)
        recovered = np.zeros_like(feats)
        for p in parts:
            recovered[p.node_ids] = p.node_features
        np.testing.assert_array_equal(recovered, feats)


class TestShardedFeatureTraining:
    """Graph-partition parallelism: features row-sharded over the mesh;
    XLA inserts the collectives for cross-shard row access."""

    def _setup(self):
        from gigl_tpu.graph.csr import HeteroGraph
        from gigl_tpu.models.encoders import GNNEncoder
        from gigl_tpu.models.link_prediction import (
            LinkPredictionDecoder,
            LinkPredictionGNN,
        )
        from gigl_tpu.training.dataset import DeviceGraph
        from gigl_tpu.training.trainer import NALPTrainer, NALPTrainerConfig

        rng = np.random.default_rng(0)
        N, E = 512, 4096
        src = rng.integers(0, N, E)
        dst = rng.integers(0, N, E)
        g = HeteroGraph.homogeneous(
            src=src, dst=dst, num_nodes=N,
            node_features=rng.normal(size=(N, 16)).astype(np.float32))
        dg = DeviceGraph.from_hetero(g, supervision_edges=np.stack([src, dst]))
        enc = GNNEncoder(hid_dim=32, out_dim=16, num_layers=2,
                         conv="graphsage")
        model = LinkPredictionGNN(encoder=enc,
                                  decoder=LinkPredictionDecoder())
        cfg = NALPTrainerConfig(fanouts=(5, 3), num_random_negs=64)
        return NALPTrainer(model, dg, cfg,
                           optimizer_args={"learning_rate": "0.01"})

    @pytest.mark.slow
    def test_sharded_matches_replicated(self):
        trainer = self._setup()
        mesh = make_mesh(8)
        state = trainer.init_state(jax.random.PRNGKey(0), batch_size=32)
        anchors = jnp.arange(32, dtype=jnp.int32)
        rng = jax.random.PRNGKey(1)

        # Replicated baseline.
        s1, loss_rep = trainer.train_step(state, anchors, rng)

        # Row-sharded features (graph partition parallelism).
        trainer.graph = shard_graph_features(trainer.graph, mesh)
        s2, loss_shard = trainer.train_step(state, anchors, rng)
        np.testing.assert_allclose(float(loss_rep), float(loss_shard),
                                   rtol=1e-5)
        # And params after the step agree.
        l1 = jax.tree_util.tree_leaves(s1.params)
        l2 = jax.tree_util.tree_leaves(s2.params)
        for a, b in zip(l1, l2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-5)

    def test_padding_inert(self):
        mesh = make_mesh(8)
        feats = jnp.asarray(
            np.random.default_rng(2).normal(size=(30, 4)).astype(np.float32))
        sharded = shard_features_rowwise(feats, mesh)
        assert sharded.shape[0] == 32  # padded to multiple of 8
        np.testing.assert_allclose(np.asarray(sharded[:30]),
                                   np.asarray(feats), rtol=1e-6)
