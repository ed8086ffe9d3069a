"""Beyond-pod-HBM training: per-shard HOST feature store + routed lookups.

The reference's cluster-RAM scale regime (GLT feature stores behind RPC —
python/gigl/distributed/dist_link_prediction_dataset.py:428-439) composed
TPU-natively (gigl_tpu/training/streaming_partitioned.py):

  - each PROCESS's host RAM holds only its shards' rows of the fused
    [features | degree | hop-cache aggregate] table (ShardedHostStore);
  - per-chip HBM holds only the O(N/P) integer adjacency;
  - a train step = plan (draws + tree expansion + routing + request
    all_to_all) -> host owner-side gather -> apply (answer all_to_all +
    un-permute + encode + loss + pmean'd update).

Losses are EXACTLY those of the HBM-resident PartitionedNALPTrainer
(bit-identical draws; see tests/test_streaming_partitioned.py).

Run (single host, 8 virtual CPU devices):

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/streaming_partitioned_training.py
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

from gigl_tpu.models.encoders import GNNEncoder
from gigl_tpu.models.link_prediction import (
    LinkPredictionDecoder,
    LinkPredictionGNN,
)
from gigl_tpu.parallel.mesh import make_mesh
from gigl_tpu.training.streaming import HostGraphStore
from gigl_tpu.training.streaming_partitioned import (
    StreamingPartitionedNALPTrainer,
)
from gigl_tpu.training.trainer import NALPTrainerConfig


def main():
    n_dev = jax.device_count()
    print(f"devices: {n_dev}")
    N, E, D = 4096, 32768, 32
    B = 128

    rng = np.random.default_rng(0)
    src, dst = rng.integers(0, N, E), rng.integers(0, N, E)
    edges = np.stack([src, dst])
    # Host store: features + hop-cache aggregate + frozen sample tables
    # (for a real out-of-core run pass a np.memmap as `features`).
    store = HostGraphStore.build(
        message_edges=edges, supervision_edges=edges,
        features=rng.normal(size=(N, D)).astype(np.float32),
        num_nodes=N, fanouts=(10, 5), seed=0)

    mesh = make_mesh(n_dev, axes=("data",))
    cfg = NALPTrainerConfig(fanouts=(10, 5), num_positives=1,
                            num_random_negs=16 * n_dev,
                            loss_type="retrieval", cached_hop=True)
    model = LinkPredictionGNN(
        encoder=GNNEncoder(hid_dim=64, out_dim=32, num_layers=2,
                           conv="graphsage"),
        decoder=LinkPredictionDecoder())
    trainer = StreamingPartitionedNALPTrainer(
        model, store, mesh, cfg, batch_size=B, capacity_factor=8.0,
        optimizer_args={"learning_rate": "0.01"})

    state = trainer.init_state(jax.random.PRNGKey(0))
    batches = rng.integers(0, N, (20, B)).astype(np.int32)
    state, losses = trainer.run_steps(state, batches, jax.random.PRNGKey(1))
    print(f"loss: {losses[0]:.3f} -> {losses[-1]:.3f}")
    assert losses[-1] < losses[0]
    print("OK — host RAM holds the features, HBM holds O(N/P) ints.")


def main_config_dispatched():
    """The same backend driven entirely from a task config — the
    should_run_glt_backend analog: trainerArgs
    streaming_partitioned_backend=true routes the NALP spec onto the
    beyond-HBM trainer with the full pipeline contract (fit with val
    cadence + checkpoint/auto-resume, streamed inference encode).
    Heterogeneous graphs dispatch the same way (per-node-type sharded
    host stores; add conv=hgt etc.)."""
    from gigl_tpu.data.mocking import (
        TOY_GRAPH_NODE_ANCHOR_LP,
        get_mocked_graph,
        mocked_task_config,
    )
    from gigl_tpu.training.task_specs import (
        NodeAnchorLinkPredictionTaskSpec,
    )

    g = get_mocked_graph(TOY_GRAPH_NODE_ANCHOR_LP)
    cfg = mocked_task_config(
        TOY_GRAPH_NODE_ANCHOR_LP, num_epochs=2, val_every_num_batches=3,
        streaming_partitioned_backend="true", capacity_factor="8.0",
        answer_dtype="bfloat16")  # halves the host->device answer bytes
    spec = NodeAnchorLinkPredictionTaskSpec()
    spec.init_model(cfg, graph=g)
    metrics = spec.train()
    emb = spec.infer_batch(np.arange(10))
    print(f"config-dispatched beyond-HBM: mrr={metrics['mrr']:.3f}, "
          f"inference embeddings {emb.shape}")


if __name__ == "__main__":
    main()
    main_config_dispatched()
