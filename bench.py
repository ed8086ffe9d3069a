"""Benchmark: NALP training-step throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: forward-aggregated edges per second per chip across the full
training step (sampling + 3x encoder forward + loss + backward + optimizer)
— the "SpMM aggregate" north star of BASELINE.md. The reference publishes no
numeric baseline (BASELINE.md: "no numeric benchmark tables"), so
vs_baseline is measured against BASELINE_EDGES_PER_S — the XLA-path
throughput of this framework's first working round-1 build on the same chip
(fixed constant so later kernel work shows as >1.0).
"""

import json
import sys
import time

import numpy as np

# Round-1 first-light measurement on TPU v5 lite (XLA path, batch 512,
# fanouts (15,10), D=128): 45.96M edges/s. Later rounds (Pallas kernels,
# bf16, fusion) are measured against this.
BASELINE_EDGES_PER_S = 4.5956e7


def main():
    import jax
    import jax.numpy as jnp

    from gigl_tpu.graph.csr import HeteroGraph
    from gigl_tpu.models.encoders import GNNEncoder
    from gigl_tpu.models.link_prediction import (
        LinkPredictionDecoder,
        LinkPredictionGNN,
    )
    from gigl_tpu.training.dataset import DeviceGraph
    from gigl_tpu.training.trainer import NALPTrainer, NALPTrainerConfig

    N, E, D = 100_000, 2_000_000, 128
    B, R = 512, 512
    FANOUTS = (15, 10)
    HID = 256

    rng = np.random.default_rng(0)
    src = rng.integers(0, N, E)
    dst = rng.integers(0, N, E)
    g = HeteroGraph.homogeneous(
        src=src, dst=dst, num_nodes=N,
        node_features=rng.normal(size=(N, D)).astype(np.float32))
    dg = DeviceGraph.from_hetero(g, supervision_edges=np.stack([src, dst]))

    enc = GNNEncoder(hid_dim=HID, out_dim=D, num_layers=2, conv="graphsage")
    model = LinkPredictionGNN(encoder=enc, decoder=LinkPredictionDecoder())
    cfg = NALPTrainerConfig(fanouts=FANOUTS, num_random_negs=R,
                            loss_type="retrieval", num_positives=1)
    trainer = NALPTrainer(model, dg, cfg,
                          optimizer_args={"learning_rate": "1e-3"})
    state = trainer.init_state(jax.random.PRNGKey(0), batch_size=B)

    step_rng = jax.random.PRNGKey(1)
    anchors = jnp.arange(B, dtype=jnp.int32)

    # Warmup (compile).
    for _ in range(3):
        state, loss = trainer.train_step(state, anchors, step_rng)
    jax.block_until_ready(loss)

    iters = 30
    t0 = time.perf_counter()
    for _ in range(iters):
        state, loss = trainer.train_step(state, anchors, step_rng)
    jax.block_until_ready(loss)
    dt = (time.perf_counter() - t0) / iters

    # Forward-aggregated edges per step: each encode of M roots with
    # fanouts (k1, k2) aggregates M*k1 (layer1@d0) + M*k1*k2 (layer1@d1)
    # + M*k1 (layer2@d0) edges. Encodes: anchors B, positives B, negs R.
    k1, k2 = FANOUTS
    per_root = 2 * k1 + k1 * k2
    roots = B + B * cfg.num_positives + R
    edges_per_step = per_root * roots
    edges_per_s = edges_per_step / dt

    print(json.dumps({
        "metric": "nalp_train_edges_per_s_per_chip",
        "value": round(edges_per_s, 1),
        "unit": "edges/s",
        "vs_baseline": round(edges_per_s / BASELINE_EDGES_PER_S, 4),
    }))


if __name__ == "__main__":
    main()
