"""BASELINE.json milestone configs as runnable synthetic stand-ins.

The judge-facing baseline (BASELINE.md "Milestone configs") names five
workloads. Real OGB downloads are unavailable in this environment (zero
egress), so each runs here on a structurally-similar synthetic graph at
reduced scale — same model family, hyperparameter shape, loss, and eval
metric as the milestone it stands in for:

  1. Cora GraphSAGE 2-layer node classification, full-batch
  2. OGBN-arxiv-style GAT 3-layer with layerwise sampling (fanouts 15/10/5)
  3. OGBN-products-style GraphSAGE unsupervised link prediction,
     margin loss, tabularized-subgraph (cached_hop) semantics
  4. OGB-MAG-style heterogeneous RGCN link prediction (typed edges,
     per-relation aggregation)
  5. MAG240M-style edge-partitioned multi-device training — covered by
     examples/sharded_full_graph.py (ring halo exchange); run it with
     JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8
     for the virtual-mesh version.

Usage:  python examples/baseline_milestones.py [--quick]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
    # The axon plugin registers itself as the default platform even when
    # JAX_PLATFORMS=cpu is exported; pin the platform explicitly (same
    # recipe as tests/conftest.py).
    jax.config.update("jax_platform_name", "cpu")

import jax.numpy as jnp
import numpy as np

QUICK = "--quick" in sys.argv


def banner(msg):
    print(f"\n=== {msg} ===", flush=True)


def milestone_1_cora_full_batch():
    banner("1. Cora-like GraphSAGE full-batch node classification")
    from gigl_tpu.data.mocking import cora_like
    from gigl_tpu.models.encoders import GNNEncoder
    from gigl_tpu.training.full_batch import (
        FullBatchTrainer,
        FullBatchTrainerConfig,
        full_batch_data_from_graph,
    )

    # label_noise keeps the milestone off the 1.0 ceiling (a saturated
    # metric cannot detect regressions); expected band ~0.80-0.95.
    g = cora_like(label_noise=0.12)
    data = full_batch_data_from_graph(g)
    num_classes = int(np.asarray(data.labels).max()) + 1
    enc = GNNEncoder(hid_dim=64, out_dim=num_classes, num_layers=2,
                     conv="graphsage")
    tr = FullBatchTrainer(enc, data,
                          FullBatchTrainerConfig(
                              num_epochs=20 if QUICK else 100, eval_every=10),
                          optimizer_args={"learning_rate": "0.01"})
    state, metrics = tr.fit()
    print(f"val accuracy: {metrics['accuracy']:.3f}  "
          f"test accuracy: {tr.accuracy(state.params, 'test'):.3f}")
    return metrics["accuracy"]


def milestone_2_arxiv_gat_sampled():
    banner("2. arxiv-style GAT 3-layer, fanouts (15, 10, 5), sampled")
    from gigl_tpu.data.mocking import cora_like
    from gigl_tpu.models.encoders import GNNEncoder
    from gigl_tpu.training.dataset import DeviceGraph
    from gigl_tpu.training.trainer import (
        NodeClassificationTrainer,
        NodeClassificationTrainerConfig,
    )

    # Lower homophily + label noise: keeps the sampled-GAT milestone off
    # the 1.0 ceiling (same sensitivity rationale as milestone 1).
    g = cora_like(num_nodes=2000, num_classes=40, dim=128, avg_degree=12,
                  seed=1, homophily=0.75, label_noise=0.12)
    dg = DeviceGraph.from_hetero(g)
    num_classes = int(dg.node_labels.max()) + 1
    enc = GNNEncoder(hid_dim=64, out_dim=num_classes, num_layers=3,
                     conv="gat", conv_kwargs={"heads": 4})
    cfg = NodeClassificationTrainerConfig(fanouts=(15, 10, 5))
    tr = NodeClassificationTrainer(enc, dg, cfg,
                                   optimizer_args={"learning_rate": "0.005"})
    nodes = np.arange(dg.num_nodes)
    rng = np.random.default_rng(0)
    rng.shuffle(nodes)
    n_train = int(0.8 * len(nodes))
    state = tr.init_state(jax.random.PRNGKey(0), batch_size=256)
    state, metrics = tr.fit(state, nodes[:n_train], nodes[n_train:],
                            batch_size=256,
                            num_epochs=2 if QUICK else 8)
    print(f"val accuracy: {metrics['accuracy']:.3f}")
    return metrics["accuracy"]


def milestone_3_products_unsupervised_margin():
    banner("3. products-style GraphSAGE unsupervised NALP, margin loss, "
           "tabularized")
    from gigl_tpu.data.mocking import toy_graph
    from gigl_tpu.graph.splitters import select_ssl_positive_edges
    from gigl_tpu.models.encoders import GNNEncoder
    from gigl_tpu.models.link_prediction import (
        LinkPredictionDecoder,
        LinkPredictionGNN,
    )
    from gigl_tpu.training.dataset import DeviceGraph
    from gigl_tpu.training.trainer import NALPTrainer, NALPTrainerConfig

    g = toy_graph(num_clusters=64, nodes_per_cluster=8, intra_edges=100,
                  dim=32, seed=2)
    et = g.metadata.edge_types[0]
    # Self-supervised positives from structural edges (the reference's
    # select_ssl_positive_label_edges semantics, dataset_factory.py:53-54).
    pos_cols = select_ssl_positive_edges(g.edges[et], positive_ratio=0.5,
                                         seed=0)
    sup = g.edges[et][:, pos_cols]
    dg = DeviceGraph.from_hetero(g, supervision_edges=sup)
    enc = GNNEncoder(hid_dim=64, out_dim=32, num_layers=2, conv="graphsage")
    model = LinkPredictionGNN(encoder=enc, decoder=LinkPredictionDecoder())
    cfg = NALPTrainerConfig(fanouts=(10, 5), num_random_negs=128,
                            loss_type="margin", margin=0.5, num_positives=2,
                            cached_hop=True, fused_cache=True)
    tr = NALPTrainer(model, dg, cfg, optimizer_args={"learning_rate": "0.01"})
    n = dg.num_nodes
    state = tr.init_state(jax.random.PRNGKey(0), batch_size=128)
    anchors = np.arange(n)
    state, metrics = tr.fit(state, anchors, anchors, batch_size=128,
                            num_epochs=2 if QUICK else 6,
                            val_every_n_batches=4, num_val_batches=2)
    print(f"val MRR: {metrics['mrr']:.3f}  hits@10: {metrics['hits@10']:.3f}")
    return metrics["mrr"]


def milestone_4_mag_hetero_rgcn():
    banner("4. MAG-style heterogeneous RGCN link prediction (typed edges)")
    from gigl_tpu.data.mocking import BIPARTITE_TOY_GRAPH_LP, get_mocked_graph
    from gigl_tpu.config.task_config import SamplingOp
    from gigl_tpu.models.hetero_encoders import HeteroGNNEncoder
    from gigl_tpu.models.link_prediction import (
        HeteroLinkPredictionGNN,
        LinkPredictionDecoder,
    )
    from gigl_tpu.sampling.hetero_sampler import resolve_path
    from gigl_tpu.training.hetero_dataset import HeteroDeviceGraph
    from gigl_tpu.training.hetero_trainer import (
        HeteroNALPTrainer,
        HeteroNALPTrainerConfig,
    )
    from gigl_tpu.types.graph import EdgeType

    g = get_mocked_graph(BIPARTITE_TOY_GRAPH_LP)
    buys = EdgeType("user", "buys", "item")
    rev = EdgeType("item", "rev_buys", "user")
    user_path = resolve_path("user", [
        SamplingOp(op_name="u1", edge_type=rev, num_nodes_to_sample=5,
                   sampling_direction="INCOMING"),
        SamplingOp(op_name="u2", edge_type=buys, num_nodes_to_sample=3,
                   input_op_names=("u1",), sampling_direction="INCOMING"),
    ])
    item_path = resolve_path("item", [
        SamplingOp(op_name="i1", edge_type=buys, num_nodes_to_sample=5,
                   sampling_direction="INCOMING"),
        SamplingOp(op_name="i2", edge_type=rev, num_nodes_to_sample=3,
                   input_op_names=("i1",), sampling_direction="INCOMING"),
    ])
    paths = {"user": user_path, "item": item_path}
    dg = HeteroDeviceGraph.from_hetero(
        g, paths, supervision_edge_type=buys,
        supervision_edges=g.edges[buys], supervision_anchor="src")
    enc = HeteroGNNEncoder(
        hid_dim=32, out_dim=16, num_layers=2, conv="rgcn", num_bases=2,
        node_types=("user", "item"),
        edge_types=("user-buys-item", "item-rev_buys-user"))
    model = HeteroLinkPredictionGNN(encoder=enc,
                                    decoder=LinkPredictionDecoder())
    cfg = HeteroNALPTrainerConfig(
        anchor_node_type="user", candidate_node_type="item",
        num_random_negs=48, loss_type="retrieval", temperature=0.1)
    tr = HeteroNALPTrainer(model, dg, paths, cfg,
                           optimizer_args={"learning_rate": "0.01"})
    users = np.arange(g.num_nodes["user"])
    state = tr.init_state(jax.random.PRNGKey(0), batch_size=32)
    state, metrics = tr.fit(state, users, users, batch_size=32,
                            num_epochs=3 if QUICK else 10,
                            val_every_n_batches=2, num_val_batches=2)
    print(f"val MRR: {metrics['mrr']:.3f}  hits@10: {metrics['hits@10']:.3f}")
    return metrics["mrr"]


def milestone_5_partitioned_hetero_multidevice():
    """MAG240M-analog (BASELINE config 5): 8-device PARTITIONED hetero
    RGCN link prediction — typed feature/CSR shards, routed op-tree
    sampling, ring-reduced grads. Real multi-host is unavailable here; the
    8-virtual-device mesh is the regressable analog. Reports final MRR,
    edges/s (virtual-mesh wall clock — regression signal, not a perf
    claim), and the MEASURED all_to_all payload bytes per train step
    (counted while tracing the step program)."""
    banner("5. MAG240M-analog: 8-device partitioned hetero RGCN")
    if jax.device_count() < 8:
        print("needs 8 devices (run with JAX_PLATFORMS=cpu XLA_FLAGS="
              "--xla_force_host_platform_device_count=8); SKIPPED")
        return None
    from gigl_tpu.config.task_config import SamplingOp
    from gigl_tpu.data.mocking import BIPARTITE_TOY_GRAPH_LP, get_mocked_graph
    from gigl_tpu.models.hetero_encoders import HeteroGNNEncoder
    from gigl_tpu.models.link_prediction import (
        HeteroLinkPredictionGNN,
        LinkPredictionDecoder,
    )
    from gigl_tpu.parallel.mesh import make_mesh
    from gigl_tpu.sampling.hetero_sampler import resolve_path
    from gigl_tpu.training.dist_hetero import (
        PartitionedHeteroGraph,
        PartitionedHeteroNALPTrainer,
    )
    from gigl_tpu.training.hetero_dataset import HeteroDeviceGraph
    from gigl_tpu.training.hetero_trainer import HeteroNALPTrainerConfig
    from gigl_tpu.types.graph import EdgeType

    g = get_mocked_graph(BIPARTITE_TOY_GRAPH_LP)
    buys = EdgeType("user", "buys", "item")
    rev = EdgeType("item", "rev_buys", "user")
    user_path = resolve_path("user", [
        SamplingOp(op_name="u1", edge_type=rev, num_nodes_to_sample=5,
                   sampling_direction="INCOMING"),
        SamplingOp(op_name="u2", edge_type=buys, num_nodes_to_sample=3,
                   input_op_names=("u1",), sampling_direction="INCOMING"),
    ])
    item_path = resolve_path("item", [
        SamplingOp(op_name="i1", edge_type=buys, num_nodes_to_sample=5,
                   sampling_direction="INCOMING"),
        SamplingOp(op_name="i2", edge_type=rev, num_nodes_to_sample=3,
                   input_op_names=("i1",), sampling_direction="INCOMING"),
    ])
    paths = {"user": user_path, "item": item_path}
    hdg = HeteroDeviceGraph.from_hetero(
        g, paths, supervision_edge_type=buys,
        supervision_edges=g.edges[buys], supervision_anchor="src")
    mesh = make_mesh(8, axes=("data",))
    pg = PartitionedHeteroGraph.build(hdg, paths, mesh,
                                      anchor_node_type="user")
    enc = HeteroGNNEncoder(
        hid_dim=32, out_dim=16, num_layers=2, conv="rgcn", num_bases=2,
        node_types=("user", "item"),
        edge_types=("user-buys-item", "item-rev_buys-user"))
    model = HeteroLinkPredictionGNN(encoder=enc,
                                    decoder=LinkPredictionDecoder())
    cfg = HeteroNALPTrainerConfig(
        anchor_node_type="user", candidate_node_type="item",
        num_random_negs=48, loss_type="retrieval", temperature=0.1)
    tr = PartitionedHeteroNALPTrainer(model, pg, paths, cfg, mesh,
                                      optimizer_args={
                                          "learning_rate": "0.01"},
                                      capacity_factor=8.0)
    users = np.arange(g.num_nodes["user"])
    B = 32
    state = tr.init_state(jax.random.PRNGKey(0), batch_size=B)

    # Measure all_to_all payload bytes/step by counting collective
    # operand sizes while the step program TRACES (one scan body).
    a2a_bytes = []
    orig_a2a = jax.lax.all_to_all
    jax.lax.all_to_all = (lambda x, *a, **k: (
        a2a_bytes.append(x.size * x.dtype.itemsize), orig_a2a(x, *a, **k)
    )[1])
    try:
        state, _ = tr.train_steps(
            state, (users[:B] % g.num_nodes["user"])[None, :],
            jax.random.PRNGKey(1))
    finally:
        jax.lax.all_to_all = orig_a2a
    a2a_per_step = int(sum(a2a_bytes))

    rng = np.random.default_rng(0)
    epochs = 3 if QUICK else 10
    steps = 0
    nb = len(users) // B
    # Warm up the (nb, B)-shaped scan program OUTSIDE the timed loop —
    # otherwise the published edges/s mostly measures jit compile (the
    # dispatch-bias class bench.py's methodology fix removed).
    warm = (users[: nb * B].reshape(nb, B)).astype(np.int32)
    state, _ = tr.train_steps(state, warm, jax.random.PRNGKey(9))
    t0 = time.time()
    for ep in range(epochs):
        order = rng.permutation(users)
        batches = order[: nb * B].reshape(nb, B)
        state, losses = tr.train_steps(state, batches,
                                       jax.random.PRNGKey(10 + ep))
        steps += nb
    dt = time.time() - t0
    metrics = tr.evaluate(state.params, [users[: len(users) // 8 * 8]])
    # forward-aggregated edges/step: both op trees are (5, 3) two-hop on
    # B anchors + B positives + num_random_negs candidates.
    per_root = 2 * 5 + 5 * 3
    roots = B + B + cfg.num_random_negs
    edges_per_s = per_root * roots * steps / max(dt, 1e-9)
    print(f"val MRR: {metrics['mrr']:.3f}  edges/s (virtual mesh): "
          f"{edges_per_s:.0f}  all_to_all bytes/step: {a2a_per_step}")
    return {"mrr": metrics["mrr"], "edges_per_s": edges_per_s,
            "all_to_all_bytes_per_step": a2a_per_step}


def main():
    t0 = time.time()
    acc1 = milestone_1_cora_full_batch()
    acc2 = milestone_2_arxiv_gat_sampled()
    mrr3 = milestone_3_products_unsupervised_margin()
    mrr4 = milestone_4_mag_hetero_rgcn()
    m5 = milestone_5_partitioned_hetero_multidevice()
    banner("summary")
    print(f"m1 cora-like full-batch acc: {acc1:.3f} (expect 0.80-0.95)")
    print(f"m2 arxiv-style GAT acc:      {acc2:.3f} (expect 0.50-0.95)")
    print(f"m3 products-style SSL MRR:   {mrr3:.3f} (expect > 0.3)")
    print(f"m4 MAG-style RGCN MRR:       {mrr4:.3f} (expect > 0.3)")
    if m5 is not None:
        print(f"m5 partitioned hetero MRR:   {m5['mrr']:.3f} (expect > 0.3)")
    if "--publish" in sys.argv:
        # Record the milestone metrics into BASELINE.json "published" so
        # later rounds regress against them (perf rows come from bench.py
        # runs on the real chip and are merged by scripts/publish_bench).
        import json
        from datetime import date

        path = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "BASELINE.json")
        with open(path) as f:
            doc = json.load(f)
        pub = doc.setdefault("published", {})
        # MERGE into the existing milestones (publishing from a <8-device
        # machine must not erase the previously published m5 baselines).
        ms = pub.setdefault("milestones", {})
        ms.update({
            "date": str(date.today()),
            "mode": "quick" if QUICK else "full",
            "m1_cora_like_full_batch_accuracy": round(float(acc1), 4),
            "m2_arxiv_style_gat_sampled_accuracy": round(float(acc2), 4),
            "m3_products_style_ssl_mrr": round(float(mrr3), 4),
            "m4_mag_style_rgcn_mrr": round(float(mrr4), 4),
        })
        if m5 is not None:
            ms.update({
                "m5_partitioned_hetero_mrr": round(float(m5["mrr"]), 4),
                "m5_partitioned_hetero_edges_per_s_virtual8":
                    round(float(m5["edges_per_s"]), 1),
                "m5_all_to_all_bytes_per_step":
                    int(m5["all_to_all_bytes_per_step"]),
            })
        with open(path, "w") as f:
            json.dump(doc, f, indent=2)
        print(f"published milestone metrics -> {path}")
    print(f"m5 multi-device: run examples/sharded_full_graph.py")
    print(f"total {time.time() - t0:.1f}s")


if __name__ == "__main__":
    main()
