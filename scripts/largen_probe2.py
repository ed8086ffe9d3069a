"""Bisect the large-N step slowdown: is it N, or the int8-quantized path?

Runs the partitioned P=1 tabularized step at N=100k with fp32 features
(the flagship bench config) and with quantize_features=True (the largeN
rung config) — same N, same shapes.  Then a small N-ladder (1M, 3M)
quantized.  If quantized@100k is ~8x slower, the 'locality cliff' is the
dequantization path, not HBM locality.
"""

import sys
import time
import types

import numpy as np

sys.path.insert(0, "/root/repo")


def build_trainer(N, E, quantize, K):
    import jax
    import jax.numpy as jnp

    from gigl_tpu.graph.csr import build_csr
    from gigl_tpu.models.encoders import GNNEncoder
    from gigl_tpu.models.link_prediction import (
        LinkPredictionDecoder,
        LinkPredictionGNN,
    )
    from gigl_tpu.parallel.mesh import make_mesh
    from gigl_tpu.training.dist_sampled import (
        PartitionedGraph,
        PartitionedNALPTrainer,
    )
    from gigl_tpu.training.trainer import NALPTrainerConfig

    D, B, R, FANOUTS = 128, 512, 512, (15, 10)
    rng = np.random.default_rng(0)
    src = rng.integers(0, N, E, dtype=np.int64)
    dst = rng.integers(0, N, E, dtype=np.int64)
    feats = rng.standard_normal((N, D), dtype=np.float32)
    csr = build_csr(src, dst, num_anchor_nodes=N, num_neighbor_nodes=N,
                    anchor="dst")
    msg = types.SimpleNamespace(indptr=csr.indptr, indices=csr.indices,
                                edge_weights=None)
    hostdg = types.SimpleNamespace(
        num_nodes=N, node_features=feats,
        degrees=np.diff(csr.indptr).astype(np.float32),
        message_csr=msg, supervision_csr=msg, hard_neg_csr=None,
        sup_edge_features=None, hard_neg_edge_features=None,
        node_labels=None)
    mesh = make_mesh(1, axes=("data",))
    pg = PartitionedGraph.build(hostdg, mesh, quantize_features=quantize)
    cfg = NALPTrainerConfig(fanouts=FANOUTS, num_random_negs=R,
                            loss_type="retrieval", num_positives=1,
                            cached_hop=True)
    enc = GNNEncoder(hid_dim=256, out_dim=D, num_layers=2,
                     conv="graphsage", dtype=jnp.bfloat16)
    model = LinkPredictionGNN(encoder=enc, decoder=LinkPredictionDecoder())
    tr = PartitionedNALPTrainer(model, pg, mesh, cfg, capacity_factor=4.0,
                                sort_gather_ids=False)
    tr.pg_base = None
    return tr, N, (B, R, FANOUTS)


def rate(tr, N, shape, K):
    import jax

    B, R, (k1, k2) = shape
    state = tr.init_state(jax.random.PRNGKey(0), batch_size=B)
    anchors = (np.arange(B * K).reshape(K, B) * 2654435761 % N).astype(
        np.int32)
    state, losses = tr.train_steps(state, anchors, jax.random.PRNGKey(1))
    _ = float(np.asarray(losses)[-1])
    best = float("inf")
    for t in range(2):
        t1 = time.perf_counter()
        state, losses = tr.train_steps(state, anchors,
                                       jax.random.PRNGKey(2 + t))
        _ = float(np.asarray(losses)[-1])
        best = min(best, (time.perf_counter() - t1) / K)
    del state
    return (2 * k1 + k1 * k2) * (B + B + R) / best, best


def main():
    K = 500
    for name, n, e, q in (("100k fp32", 100_000, 2_000_000, False),
                          ("100k int8", 100_000, 2_000_000, True),
                          ("1M int8", 1_000_000, 10_000_000, True),
                          ("1M fp32", 1_000_000, 10_000_000, False),
                          ("3M int8", 3_000_000, 20_000_000, True),
                          ("3M fp32", 3_000_000, 20_000_000, False)):
        t0 = time.perf_counter()
        tr, N, shape = build_trainer(n, e, q, K)
        eps, dt = rate(tr, N, shape, K)
        print(f"{name}: {eps/1e6:.1f}M edges/s ({dt*1e3:.3f} ms/step) "
              f"[build {time.perf_counter()-t0:.0f}s]", flush=True)
        del tr


if __name__ == "__main__":
    main()
