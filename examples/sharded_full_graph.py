"""Whole-graph training sharded across every visible device.

Demonstrates graph-partition parallelism end-to-end: node rows (features,
activations, labels, split masks) are range-sharded over the device mesh,
each GNN layer aggregates through the edge-partitioned ring halo exchange
(`gigl_tpu.parallel.halo` — feature blocks rotate over ICI via ppermute,
overlapped with local gather/scatter), and parameters stay replicated with
the gradient all-reduce inserted by XLA. Per-chip activation HBM is O(N/P),
so full-graph capacity scales with the mesh.

This is the TPU-native counterpart of the reference's v2 in-memory path
(partition the graph across machines + DDP training;
`python/gigl/distributed/dist_link_prediction_data_partitioner.py`,
`python/gigl/src/training/v1/lib/training_process.py:100-119`).

Usage:
  python examples/sharded_full_graph.py                 # real device(s)
  JAX_NUM_CPU_DEVICES=8 style virtual mesh for a laptop run:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python examples/sharded_full_graph.py --cpu
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    if "--cpu" in sys.argv:
        import jax

        jax.config.update("jax_platform_name", "cpu")
    import jax

    from gigl_tpu.data.mocking import CORA_NODE_CLASSIFICATION, get_mocked_graph
    from gigl_tpu.parallel import make_mesh
    from gigl_tpu.training.sharded_full_batch import (
        ShardedFullBatchConfig,
        ShardedFullBatchTrainer,
    )

    graph = get_mocked_graph(CORA_NODE_CLASSIFICATION)
    nt = graph.metadata.node_types[0]
    et = graph.metadata.edge_types[0]
    edges = np.asarray(graph.edges[et])
    n = graph.num_nodes[nt]
    x = np.asarray(graph.node_features[nt], np.float32)
    labels = np.asarray(graph.node_labels[nt])
    num_classes = int(labels.max()) + 1

    rng = np.random.default_rng(0)
    which = rng.integers(0, 10, n)
    train_mask, val_mask, test_mask = which < 8, which == 8, which == 9

    mesh = make_mesh(len(jax.devices()))
    print(f"mesh: {mesh.shape} over {jax.devices()[0].platform}")
    trainer = ShardedFullBatchTrainer(
        edges, x, labels, train_mask, val_mask, test_mask, mesh,
        ShardedFullBatchConfig(conv="gcn", hid_dim=64, out_dim=num_classes,
                               num_epochs=100, eval_every=20),
        optimizer_args={"learning_rate": "0.01"})
    state, metrics = trainer.fit()
    print(f"val accuracy:  {metrics['accuracy']:.4f}")
    print(f"test accuracy: {metrics['test_accuracy']:.4f}")


if __name__ == "__main__":
    main()
