"""Deterministic distributed-training scenario shared by the REAL
2-process cluster test (tests/test_multiprocess_trainer.py) and its
single-process 8-device reference run.

The same function runs in both regimes over the same global 8-device
mesh; in the 2-process run every shard_map collective
(all_to_all / ppermute / psum) actually crosses a process boundary — the
DCN-analog fabric the reference exercises with spawned RPC workers
(ref tests/integration/distributed/distributed_dataset_test.py:34-60,
tests/test_assets/distributed/run_distributed_dataset.py:22-60).
"""

from __future__ import annotations

import numpy as np

N, E, D = 256, 2048, 16
BATCH = 64
K_STEPS = 3
N_CHUNKS = 2


def _toy_graph():
    from gigl_tpu.graph.csr import HeteroGraph
    from gigl_tpu.training.dataset import DeviceGraph

    rng = np.random.default_rng(0)
    src = rng.integers(0, N, E)
    dst = rng.integers(0, N, E)
    g = HeteroGraph.homogeneous(
        src=src, dst=dst, num_nodes=N,
        node_features=rng.normal(size=(N, D)).astype(np.float32))
    return DeviceGraph.from_hetero(
        g, supervision_edges=np.stack([src, dst])), np.stack([src, dst])


def _model():
    from gigl_tpu.models.encoders import GNNEncoder
    from gigl_tpu.models.link_prediction import (
        LinkPredictionDecoder,
        LinkPredictionGNN,
    )

    enc = GNNEncoder(hid_dim=32, out_dim=16, num_layers=2,
                     conv="graphsage", dropout=0.0)
    return LinkPredictionGNN(encoder=enc, decoder=LinkPredictionDecoder())


def run_scenario() -> dict:
    """Run on the current global device set (must be 8 devices); returns
    numerical fingerprints of every distributed regime exercised."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from gigl_tpu.parallel.halo import ring_sharded_aggregate
    from gigl_tpu.training.dist_sampled import (
        PartitionedGraph,
        PartitionedNALPTrainer,
    )
    from gigl_tpu.training.trainer import NALPTrainerConfig

    assert jax.device_count() == 8, jax.device_count()
    mesh = Mesh(np.asarray(jax.devices()).reshape(8), ("data",))
    dg, edges = _toy_graph()
    out: dict = {}

    # -- partitioned trainer: tabularized fast path + ring global pool ----
    cfg = NALPTrainerConfig(fanouts=(5, 3), num_positives=1,
                            num_random_negs=64, loss_type="retrieval",
                            cached_hop=True, global_candidate_pool=True,
                            seed=7)
    pg = PartitionedGraph.build(dg, mesh)
    trainer = PartitionedNALPTrainer(_model(), pg, mesh, cfg,
                                     capacity_factor=8.0,
                                     overflow_policy="raise")
    state = trainer.init_state(jax.random.PRNGKey(0), batch_size=BATCH)
    arng = np.random.default_rng(3)
    losses = []
    for c in range(N_CHUNKS):
        anchors = arng.integers(0, N, (K_STEPS, BATCH)).astype(np.int32)
        state, l = trainer.train_steps(state, anchors,
                                       jax.random.PRNGKey(100 + c))
        losses.extend(float(x) for x in np.asarray(l))
    out["partitioned_losses"] = losses
    val = arng.integers(0, N, 64).astype(np.int32)
    out["partitioned_mrr"] = float(
        trainer.evaluate(state.params, [val])["mrr"])

    # -- streamed trainer over the global mesh ----------------------------
    from gigl_tpu.training.streaming import (
        HostGraphStore,
        StreamingNALPTrainer,
    )

    store = HostGraphStore.build(
        message_edges=edges, supervision_edges=edges,
        features=np.asarray(dg.node_features, np.float32),
        num_nodes=N, fanouts=(5, 3), seed=7)
    scfg = NALPTrainerConfig(fanouts=(5, 3), num_positives=1,
                             num_random_negs=64, loss_type="retrieval",
                             cached_hop=True, seed=7)
    st = StreamingNALPTrainer(_model(), store, scfg, mesh=mesh)
    sstate = st.init_state(jax.random.PRNGKey(1), batch_size=BATCH)
    batch = st.prepare_batch(arng.integers(0, N, BATCH).astype(np.int32),
                             step=0)
    sstate, sloss = st.train_step(sstate, batch, jax.random.PRNGKey(2))
    out["streamed_loss"] = float(np.asarray(sloss))

    # -- streamed-partitioned: per-PROCESS host feature shard + routed
    # lookups (each process's RAM holds only its devices' rows; the
    # owner-side gather happens on host, answers re-enter via all_to_all)
    from gigl_tpu.training.streaming_partitioned import (
        StreamingPartitionedNALPTrainer,
    )

    spt = StreamingPartitionedNALPTrainer(
        _model(), store, mesh, scfg, batch_size=BATCH,
        capacity_factor=8.0, overflow_policy="raise")
    sp_state = spt.init_state(jax.random.PRNGKey(5))
    sp_anchors = arng.integers(0, N, BATCH).astype(np.int32)
    sp_state, sp_loss = spt.train_step(
        sp_state, sp_anchors, np.asarray(jax.random.PRNGKey(6)), 0)
    out["streamed_partitioned_loss"] = float(np.asarray(sp_loss))

    # -- typed (hetero) partitioned trainer over the global mesh ----------
    from gigl_tpu.config.task_config import SamplingOp
    from gigl_tpu.data.mocking import BIPARTITE_TOY_GRAPH_LP, get_mocked_graph
    from gigl_tpu.models.hetero_encoders import HeteroGNNEncoder
    from gigl_tpu.models.link_prediction import (
        HeteroLinkPredictionGNN,
        LinkPredictionDecoder,
    )
    from gigl_tpu.sampling.hetero_sampler import resolve_path
    from gigl_tpu.training.dist_hetero import (
        PartitionedHeteroGraph,
        PartitionedHeteroNALPTrainer,
    )
    from gigl_tpu.training.hetero_dataset import HeteroDeviceGraph
    from gigl_tpu.training.hetero_trainer import HeteroNALPTrainerConfig
    from gigl_tpu.types.graph import EdgeType

    hg = get_mocked_graph(BIPARTITE_TOY_GRAPH_LP)
    buys = EdgeType("user", "buys", "item")
    rev = EdgeType("item", "rev_buys", "user")
    hpaths = {
        "user": resolve_path("user", [
            SamplingOp(op_name="u1", edge_type=rev, num_nodes_to_sample=5,
                       sampling_direction="INCOMING"),
            SamplingOp(op_name="u2", edge_type=buys,
                       num_nodes_to_sample=3, input_op_names=("u1",),
                       sampling_direction="INCOMING")]),
        "item": resolve_path("item", [
            SamplingOp(op_name="i1", edge_type=buys,
                       num_nodes_to_sample=5,
                       sampling_direction="INCOMING"),
            SamplingOp(op_name="i2", edge_type=rev,
                       num_nodes_to_sample=3, input_op_names=("i1",),
                       sampling_direction="INCOMING")]),
    }
    hdg = HeteroDeviceGraph.from_hetero(
        hg, hpaths, supervision_edge_type=buys,
        supervision_edges=hg.edges[buys], supervision_anchor="src")
    hpg = PartitionedHeteroGraph.build(hdg, hpaths, mesh,
                                       anchor_node_type="user")
    hmodel = HeteroLinkPredictionGNN(
        encoder=HeteroGNNEncoder(
            hid_dim=32, out_dim=16, num_layers=2, conv="rgcn",
            num_bases=2, node_types=("user", "item"),
            edge_types=("user-buys-item", "item-rev_buys-user")),
        decoder=LinkPredictionDecoder())
    hcfg = HeteroNALPTrainerConfig(
        anchor_node_type="user", candidate_node_type="item",
        num_random_negs=48, loss_type="retrieval", temperature=0.1,
        global_candidate_pool=True)
    htr = PartitionedHeteroNALPTrainer(hmodel, hpg, hpaths, hcfg, mesh,
                                       capacity_factor=8.0,
                                       overflow_policy="raise")
    hstate = htr.init_state(jax.random.PRNGKey(4), batch_size=32)
    hanchors = (np.arange(2 * 32).reshape(2, 32)
                % hg.num_nodes["user"]).astype(np.int32)
    hstate, hlosses = htr.train_steps(hstate, hanchors,
                                      jax.random.PRNGKey(5))
    out["hetero_partitioned_losses"] = [float(x)
                                        for x in np.asarray(hlosses)]

    # -- TYPED streamed-partitioned: per-process per-NODE-TYPE host
    # feature shards + the plan/host/apply split of the typed step (the
    # beyond-HBM typed regime; same seeds as the HBM typed trainer above,
    # so the losses must be bit-compatible across regimes AND across the
    # process fabric) ----------------------------------------------------
    from gigl_tpu.training.streaming_partitioned import (
        StreamingPartitionedHeteroNALPTrainer,
    )

    hpg_nofeat = PartitionedHeteroGraph.build(
        hdg, hpaths, mesh, anchor_node_type="user",
        features_on_device=False)
    hspt = StreamingPartitionedHeteroNALPTrainer(
        hmodel, hpg_nofeat, hpaths, hcfg, mesh, batch_size=32,
        host_features={nt: np.asarray(f)
                       for nt, f in hdg.node_features.items()},
        capacity_factor=8.0, overflow_policy="raise")
    hs_state = hspt.init_state(jax.random.PRNGKey(4), batch_size=32)
    hs_state, hs_losses = hspt.run_steps(hs_state, hanchors,
                                         jax.random.PRNGKey(5))
    out["hetero_streamed_partitioned_losses"] = [float(x)
                                                 for x in hs_losses]

    # -- halo ring SpMM over the edge-partitioned graph -------------------
    feats = np.asarray(dg.node_features, np.float32)
    agg, _run, _sched = ring_sharded_aggregate(edges, feats, N, mesh,
                                               reduce="mean")
    total = jax.jit(lambda a: jnp.sum(a * a),
                    out_shardings=NamedSharding(mesh, P()))(agg)
    out["halo_sumsq"] = float(np.asarray(total))
    return out
