"""Out-of-core NALP training: features on disk (mmap), streamed per batch.

The MAG240M-shaped recipe (BASELINE.md): when node features exceed HBM
(244M x 768 fp32 = 750 GB), keep them host-side behind the C++ threaded
feature store and stream only each batch's gathered rows to the device
(training/streaming.py). The host sampler draws are bit-identical to the
on-device sampler, so this path trains the SAME model as the
device-resident tabularized trainer.

Usage:  python examples/out_of_core_streaming.py [num_nodes] [dim]
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
    # The axon plugin registers itself as the default platform even when
    # JAX_PLATFORMS=cpu is exported; pin explicitly (as tests/conftest.py).
    import jax

    jax.config.update("jax_platform_name", "cpu")

import numpy as np

import jax

from gigl_tpu.models.encoders import GNNEncoder
from gigl_tpu.models.link_prediction import (
    LinkPredictionDecoder,
    LinkPredictionGNN,
)
from gigl_tpu.training.streaming import HostGraphStore, StreamingNALPTrainer
from gigl_tpu.training.trainer import NALPTrainerConfig


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    e = n * 20
    rng = np.random.default_rng(0)
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    edges = np.stack([src, dst])

    # Features live on DISK; the process only maps them.
    feat_path = tempfile.mktemp(suffix=".feats.bin")
    rng.normal(size=(n, dim)).astype(np.float32).tofile(feat_path)
    feats = np.memmap(feat_path, dtype=np.float32, mode="r", shape=(n, dim))

    # User-defined hard negatives (UDL semantics) stream like every other
    # group: give the store a hard-negative edge list.
    hard_edges = np.stack([rng.integers(0, n, n * 2),
                           rng.integers(0, n, n * 2)])

    fanouts = (15, 10)
    store = HostGraphStore.build(
        message_edges=edges, supervision_edges=edges, features=feats,
        num_nodes=n, fanouts=fanouts, seed=0, hard_neg_edges=hard_edges)

    enc = GNNEncoder(hid_dim=256, out_dim=dim, num_layers=2, conv="graphsage")
    model = LinkPredictionGNN(encoder=enc, decoder=LinkPredictionDecoder())
    cfg = NALPTrainerConfig(fanouts=fanouts, num_random_negs=512,
                            num_hard_negs=2,
                            loss_type="retrieval", cached_hop=True)
    trainer = StreamingNALPTrainer(
        model, store, cfg, optimizer_args={"learning_rate": "1e-3"},
        stream_dtype="bfloat16")  # halves host->device transfer

    batch = 512
    state = trainer.init_state(jax.random.PRNGKey(0), batch_size=batch)
    steps = 30
    anchors = (np.arange(batch * steps).reshape(steps, batch) % n).astype(
        np.int32)
    state, losses = trainer.run_steps(state, anchors, jax.random.PRNGKey(1))
    print(f"loss {losses[0]:.3f} -> {losses[-1]:.3f} over {steps} steps "
          f"(features never device-resident; table on disk at {feat_path})")
    metrics = trainer.evaluate(state.params, anchors[:4])
    print("eval:", {k: round(v, 4) for k, v in metrics.items()})


if __name__ == "__main__":
    main()
