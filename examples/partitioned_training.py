"""Partitioned-graph sampled NALP training across a device mesh.

The v2 "GLT distributed" regime of the reference (graph partitioned across
machines' RAM; remote sampling + feature RPC —
python/gigl/distributed/distributed_neighborloader.py:26) as one SPMD
program: each chip's HBM holds only its 1/P range of feature rows and CSR
adjacency; frontier expansion and feature hydration are all_to_all-routed
to owner shards (gigl_tpu/parallel/feature_lookup.py); gradients are
pmean-reduced.

Run on any device count (single host with 8 virtual CPU devices shown):

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/partitioned_training.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
    # The axon plugin registers itself as the default platform even when
    # JAX_PLATFORMS=cpu is exported; pin explicitly (as tests/conftest.py).
    jax.config.update("jax_platform_name", "cpu")

from gigl_tpu.graph.csr import HeteroGraph
from gigl_tpu.graph.splitters import HashedNodeAnchorLinkSplitter
from gigl_tpu.models.encoders import GNNEncoder
from gigl_tpu.models.link_prediction import (
    LinkPredictionDecoder,
    LinkPredictionGNN,
)
from gigl_tpu.parallel import make_mesh
from gigl_tpu.training.dataset import DeviceGraph
from gigl_tpu.training.dist_sampled import (
    PartitionedGraph,
    PartitionedNALPTrainer,
)
from gigl_tpu.training.trainer import NALPTrainerConfig


def main():
    n_dev = len(jax.devices())
    rng = np.random.default_rng(0)
    num_nodes, num_edges, dim = 4096, 40_000, 64
    src = rng.integers(0, num_nodes, num_edges)
    dst = rng.integers(0, num_nodes, num_edges)
    feats = rng.normal(size=(num_nodes, dim)).astype(np.float32)

    graph = HeteroGraph.homogeneous(src=src, dst=dst, num_nodes=num_nodes,
                                    node_features=feats)
    # Deterministic anchor split (ref HashedNodeAnchorLinkSplitter).
    splitter = HashedNodeAnchorLinkSplitter()
    train_nodes, val_nodes, _ = splitter(np.stack([src, dst]))

    dg = DeviceGraph.from_hetero(graph,
                                 supervision_edges=np.stack([src, dst]))
    mesh = make_mesh(n_dev)
    pg = PartitionedGraph.build(dg, mesh)  # O(N/P) rows + CSR per chip

    model = LinkPredictionGNN(
        encoder=GNNEncoder(hid_dim=128, out_dim=64, num_layers=2,
                           conv="graphsage"),
        decoder=LinkPredictionDecoder())
    # cached_hop composes the v1 tabularized FAST path with the v2
    # partitioned SCALE path (the reference offers one or the other):
    # sharded frozen sample tables + a deepest-hop aggregate cache fused
    # into the feature columns — 66% of the replicated fast path's
    # edges/s on one chip (docs/performance.md).
    cfg = NALPTrainerConfig(fanouts=(10, 5), num_positives=1,
                            num_random_negs=16 * n_dev,
                            loss_type="retrieval", cached_hop=True)
    trainer = PartitionedNALPTrainer(model, pg, mesh, cfg,
                                     optimizer_args={"learning_rate": "1e-3"})

    batch = 16 * n_dev
    state = trainer.init_state(jax.random.PRNGKey(0), batch_size=batch)
    steps_per_chunk = 50
    anchors = rng.choice(train_nodes, (steps_per_chunk, batch)).astype(
        np.int32)
    for chunk in range(4):
        state, losses = trainer.train_steps(
            state, anchors, jax.random.PRNGKey(chunk + 1))
        metrics = trainer.evaluate(
            state.params,
            [rng.choice(val_nodes, batch).astype(np.int32)
             for _ in range(2)],
            step=chunk)
        print(f"chunk {chunk}: loss {float(losses[-1]):.4f} "
              f"val mrr {metrics['mrr']:.4f}")

    emb = trainer.encode_batch(state.params,
                               np.arange(batch, dtype=np.int32))
    print(f"inference encode: {emb.shape} over {n_dev} shards "
          f"({pg.rows_per_shard} feature rows per chip)")


if __name__ == "__main__":
    main()
