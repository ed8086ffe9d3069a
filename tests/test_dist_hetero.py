"""Partitioned heterogeneous sampled training (typed GLT-distributed
equivalent) on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

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
from gigl_tpu.training.hetero_trainer import (
    HeteroNALPTrainer,
    HeteroNALPTrainerConfig,
)
from gigl_tpu.types.graph import EdgeType


def _bipartite_paths():
    buys = EdgeType("user", "buys", "item")
    rev = EdgeType("item", "rev_buys", "user")
    user_ops = [
        SamplingOp(op_name="u_items", edge_type=rev, num_nodes_to_sample=5,
                   sampling_direction="INCOMING"),
        SamplingOp(op_name="u_items_users", edge_type=buys,
                   num_nodes_to_sample=3, input_op_names=("u_items",),
                   sampling_direction="INCOMING"),
    ]
    item_ops = [
        SamplingOp(op_name="i_users", edge_type=buys, num_nodes_to_sample=5,
                   sampling_direction="INCOMING"),
        SamplingOp(op_name="i_users_items", edge_type=rev,
                   num_nodes_to_sample=3, input_op_names=("i_users",),
                   sampling_direction="INCOMING"),
    ]
    return {"user": resolve_path("user", user_ops),
            "item": resolve_path("item", item_ops)}


def _setup(num_random_negs=32, num_hard_negs=0):
    mesh = make_mesh(8)
    g = get_mocked_graph(BIPARTITE_TOY_GRAPH_LP)
    paths = _bipartite_paths()
    buys = EdgeType("user", "buys", "item")
    hdg = HeteroDeviceGraph.from_hetero(
        g, paths, supervision_edge_type=buys,
        supervision_edges=g.edges[buys], supervision_anchor="src")
    enc = HeteroGNNEncoder(
        hid_dim=32, out_dim=16, num_layers=2, conv="hgt",
        node_types=("user", "item"),
        edge_types=("user-buys-item", "item-rev_buys-user"), heads=2)
    model = HeteroLinkPredictionGNN(encoder=enc,
                                    decoder=LinkPredictionDecoder())
    cfg = HeteroNALPTrainerConfig(
        anchor_node_type="user", candidate_node_type="item",
        num_random_negs=num_random_negs, num_hard_negs=num_hard_negs,
        loss_type="retrieval", temperature=0.1)
    pg = PartitionedHeteroGraph.build(hdg, paths, mesh,
                                      anchor_node_type="user")
    trainer = PartitionedHeteroNALPTrainer(
        model, pg, paths, cfg, mesh, capacity_factor=8.0,
        optimizer_args={"learning_rate": "0.01"})
    return mesh, g, hdg, paths, model, cfg, trainer


class TestPartitionedHeteroGraph:
    def test_build_shapes(self):
        mesh, g, hdg, paths, model, cfg, trainer = _setup()
        pg = trainer.pg
        for nt, f in pg.feats.items():
            assert f.shape[0] == 8 * pg.rows[nt]
        assert set(pg.csr_ip) == {op.csr_key for ops in paths.values()
                                  for op in ops}
        assert pg.sup_ip is not None


class TestPartitionedHeteroTrainer:
    @pytest.mark.slow
    def test_sampling_parity_with_replicated(self):
        """Loss of the partitioned step == mean of per-shard replicated
        losses (bit-identical typed sampling + shared random negatives)."""
        mesh, g, hdg, paths, model, cfg, trainer = _setup()
        B = 32
        state = trainer.init_state(jax.random.PRNGKey(0), batch_size=B)
        params0 = jax.tree_util.tree_map(np.asarray, state.params)
        n_users = g.num_nodes["user"]
        anchors = (np.arange(B, dtype=np.int32) * 5) % n_users

        ref = HeteroNALPTrainer(model, hdg, paths, cfg)
        from gigl_tpu.training.trainer import nalp_loss_from_embeddings

        b = B // 8
        per_shard = []
        for s in range(8):
            a = jnp.asarray(anchors[s * b: (s + 1) * b])
            batch = ref._sample_batch(hdg, a, num_hard_negs=0,
                                      seed=cfg.seed, step=0)
            q = ref._encode_impl(hdg, params0, batch.anchors, "user", 0,
                                 False)
            pos = ref._encode_impl(hdg, params0, batch.pos, "item", 1, False)
            rand = ref._encode_impl(hdg, params0, batch.random_neg, "item",
                                    2, False)
            loss, _ = nalp_loss_from_embeddings(
                model, params0, cfg, batch, q, pos, None, rand)
            per_shard.append(float(loss))

        state, losses = trainer.train_steps(state, anchors[None, :],
                                            jax.random.PRNGKey(1))
        assert float(losses[0]) == pytest.approx(np.mean(per_shard),
                                                 rel=1e-4)

    @pytest.mark.slow
    def test_learns_bipartite_structure(self):
        mesh, g, hdg, paths, model, cfg, trainer = _setup()
        B, K = 32, 30
        state = trainer.init_state(jax.random.PRNGKey(0), batch_size=B)
        n_users = g.num_nodes["user"]
        anchors = np.stack([np.arange(B) % n_users] * K).astype(np.int32)
        state, losses = trainer.train_steps(state, anchors,
                                            jax.random.PRNGKey(1))
        losses = np.asarray(losses)
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0] * 0.8
        metrics = trainer.evaluate(
            state.params, [np.arange(B, dtype=np.int32) % n_users])
        assert metrics["mrr"] > 0.3, metrics

    @pytest.mark.slow
    def test_encode_per_type(self):
        mesh, g, hdg, paths, model, cfg, trainer = _setup()
        state = trainer.init_state(jax.random.PRNGKey(0), batch_size=16)
        u = trainer.encode_batch(state.params, np.arange(16), "user")
        it = trainer.encode_batch(state.params, np.arange(16), "item")
        assert u.shape == (16, 16) and it.shape == (16, 16)
        assert np.isfinite(np.asarray(u)).all()

    def test_tabularized_requires_prebuilt_tables(self):
        mesh = make_mesh(8)
        g = get_mocked_graph(BIPARTITE_TOY_GRAPH_LP)
        paths = _bipartite_paths()
        buys = EdgeType("user", "buys", "item")
        hdg = HeteroDeviceGraph.from_hetero(
            g, paths, supervision_edge_type=buys,
            supervision_edges=g.edges[buys], supervision_anchor="src")
        pg = PartitionedHeteroGraph.build(hdg, paths, mesh,
                                          anchor_node_type="user")
        cfg = HeteroNALPTrainerConfig(
            anchor_node_type="user", candidate_node_type="item",
            num_random_negs=32, tabularized=True)
        with pytest.raises(ValueError, match="with_sample_tables"):
            PartitionedHeteroNALPTrainer(None, pg, paths, cfg, mesh)


class TestPartitionedHeteroTabularized:
    """The typed tabularized fast path over the PARTITIONED graph:
    sharded frozen sample tables, one routed gather per op; draws
    bit-identical to the replicated hetero tabularized path (same
    builder)."""

    def _setup_tab(self):
        mesh = make_mesh(8)
        g = get_mocked_graph(BIPARTITE_TOY_GRAPH_LP)
        paths = _bipartite_paths()
        buys = EdgeType("user", "buys", "item")
        hdg = HeteroDeviceGraph.from_hetero(
            g, paths, supervision_edge_type=buys,
            supervision_edges=g.edges[buys], supervision_anchor="src")
        enc = HeteroGNNEncoder(
            hid_dim=32, out_dim=16, num_layers=2, conv="hgt",
            node_types=("user", "item"),
            edge_types=("user-buys-item", "item-rev_buys-user"), heads=2)
        model = HeteroLinkPredictionGNN(encoder=enc,
                                        decoder=LinkPredictionDecoder())
        cfg = HeteroNALPTrainerConfig(
            anchor_node_type="user", candidate_node_type="item",
            num_random_negs=32, loss_type="retrieval", temperature=0.1,
            tabularized=True)
        pg = PartitionedHeteroGraph.build(
            hdg, paths, mesh, anchor_node_type="user"
        ).with_sample_tables(hdg, paths, mesh, seed=cfg.seed)
        trainer = PartitionedHeteroNALPTrainer(
            model, pg, paths, cfg, mesh, capacity_factor=8.0,
            optimizer_args={"learning_rate": "0.01"})
        return mesh, g, hdg, paths, model, cfg, trainer

    @pytest.mark.slow
    def test_loss_parity_with_replicated_tabularized(self):
        mesh, g, hdg, paths, model, cfg, trainer = self._setup_tab()
        B = 32
        state = trainer.init_state(jax.random.PRNGKey(0), batch_size=B)
        params0 = jax.tree_util.tree_map(np.asarray, state.params)
        n_users = g.num_nodes["user"]
        anchors = (np.arange(B, dtype=np.int32) * 5) % n_users

        ref = HeteroNALPTrainer(model, hdg, paths, cfg)  # freezes tables
        from gigl_tpu.training.trainer import nalp_loss_from_embeddings

        b = B // 8
        per_shard = []
        for s in range(8):
            a = jnp.asarray(anchors[s * b: (s + 1) * b])
            batch = ref._sample_batch(ref.graph, a, num_hard_negs=0,
                                      seed=cfg.seed, step=0)
            q = ref._encode_impl(ref.graph, params0, batch.anchors, "user",
                                 0, False)
            pos = ref._encode_impl(ref.graph, params0, batch.pos, "item",
                                   1, False)
            rand = ref._encode_impl(ref.graph, params0, batch.random_neg,
                                    "item", 2, False)
            loss, _ = nalp_loss_from_embeddings(
                model, params0, cfg, batch, q, pos, None, rand)
            per_shard.append(float(loss))
        state, losses = trainer.train_steps(state, anchors[None, :],
                                            jax.random.PRNGKey(1))
        assert float(losses[0]) == pytest.approx(np.mean(per_shard),
                                                 rel=1e-4)

    @pytest.mark.slow
    def test_tables_match_replicated_and_refresh(self):
        mesh, g, hdg, paths, model, cfg, trainer = self._setup_tab()
        hdg_tab = hdg.with_sample_tables(paths, seed=cfg.seed)
        for key, rep in hdg_tab.sample_tables.items():
            part = np.asarray(trainer.pg.sample_tables[key])
            np.testing.assert_array_equal(np.asarray(rep),
                                          part[: rep.shape[0]])
        t0 = {k: np.asarray(v) for k, v in trainer.pg.sample_tables.items()}
        trainer.refresh_tables(hdg, epoch=1)
        changed = any((t0[k] != np.asarray(v)).any()
                      for k, v in trainer.pg.sample_tables.items())
        assert changed

    @pytest.mark.slow
    def test_trains_and_evaluates(self):
        mesh, g, hdg, paths, model, cfg, trainer = self._setup_tab()
        B, K = 32, 10
        state = trainer.init_state(jax.random.PRNGKey(0), batch_size=B)
        n_users = g.num_nodes["user"]
        anchors = np.stack([np.arange(B) % n_users] * K).astype(np.int32)
        state, losses = trainer.train_steps(state, anchors,
                                            jax.random.PRNGKey(1))
        losses = np.asarray(losses)
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0]
        metrics = trainer.evaluate(
            state.params, [np.arange(B, dtype=np.int32) % n_users])
        assert 0.0 <= metrics["mrr"] <= 1.0


class TestHeteroGlobalCandidatePool:
    @pytest.mark.slow
    def test_first_step_equals_replicated_full_batch(self):
        """global_candidate_pool over the typed partitioned trainer: the
        first step equals the replicated hetero trainer's full-batch loss
        (same draws, global candidate pool via the ppermute ring)."""
        import dataclasses

        mesh, g, hdg, paths, model, cfg, _ = _setup()
        cfg = dataclasses.replace(cfg, global_candidate_pool=True)
        pg = PartitionedHeteroGraph.build(hdg, paths, mesh,
                                          anchor_node_type="user")
        trainer = PartitionedHeteroNALPTrainer(
            model, pg, paths, cfg, mesh, capacity_factor=8.0,
            optimizer_args={"learning_rate": "0.01"})
        B = 32
        state = trainer.init_state(jax.random.PRNGKey(0), batch_size=B)
        params0 = jax.tree_util.tree_map(np.asarray, state.params)
        n_users = g.num_nodes["user"]
        anchors = (np.arange(B, dtype=np.int32) * 5) % n_users

        rep = HeteroNALPTrainer(model, hdg, paths, cfg)
        st_r = rep.init_state(jax.random.PRNGKey(0), batch_size=B,
                              params=jax.tree_util.tree_map(
                                  jnp.asarray, params0))
        _, loss_rep = rep.train_step(st_r, anchors, jax.random.PRNGKey(1))

        _, losses = trainer.train_steps(state, anchors[None, :],
                                        jax.random.PRNGKey(1))
        assert float(losses[0]) == pytest.approx(float(loss_rep), rel=1e-4)


def _weighted_setup():
    """Bipartite graph with edge features on both directed types; the
    first-hop op of each path samples WEIGHTED (live)."""
    mesh = make_mesh(8)
    g = get_mocked_graph(BIPARTITE_TOY_GRAPH_LP)
    buys = EdgeType("user", "buys", "item")
    rev = EdgeType("item", "rev_buys", "user")
    rng = np.random.default_rng(11)
    for et in (buys, rev):
        m = g.edges[et].shape[1]
        g.edge_features.features[str(et)] = (
            rng.random((m, 1)).astype(np.float32) + 0.05)
    user_ops = [
        SamplingOp(op_name="u_items", edge_type=rev, num_nodes_to_sample=4,
                   sampling_direction="INCOMING",
                   sampling_method="weighted"),
        SamplingOp(op_name="u_items_users", edge_type=buys,
                   num_nodes_to_sample=3, input_op_names=("u_items",),
                   sampling_direction="INCOMING"),
    ]
    item_ops = [
        SamplingOp(op_name="i_users", edge_type=buys,
                   num_nodes_to_sample=4, sampling_direction="INCOMING",
                   sampling_method="top_k"),
        SamplingOp(op_name="i_users_items", edge_type=rev,
                   num_nodes_to_sample=3, input_op_names=("i_users",),
                   sampling_direction="INCOMING"),
    ]
    paths = {"user": resolve_path("user", user_ops),
             "item": resolve_path("item", item_ops)}
    hdg = HeteroDeviceGraph.from_hetero(
        g, paths, supervision_edge_type=buys,
        supervision_edges=g.edges[buys], supervision_anchor="src")
    enc = HeteroGNNEncoder(
        hid_dim=32, out_dim=16, num_layers=2, conv="hgt",
        node_types=("user", "item"),
        edge_types=("user-buys-item", "item-rev_buys-user"), heads=2)
    model = HeteroLinkPredictionGNN(encoder=enc,
                                    decoder=LinkPredictionDecoder())
    # global_candidate_pool: the partitioned ring loss scores every query
    # against ALL shards' candidates — mathematically the replicated
    # full-batch pool, so train_steps losses are directly comparable
    # (per-shard pools differ from the full batch by construction).
    cfg = HeteroNALPTrainerConfig(
        anchor_node_type="user", candidate_node_type="item",
        num_random_negs=32, loss_type="retrieval", temperature=0.1,
        global_candidate_pool=True)
    return mesh, g, hdg, paths, model, cfg


class TestLiveWeightedSampling:
    @pytest.mark.slow
    def test_loss_parity_with_replicated_weighted_live(self):
        """LIVE weighted/top-k op trees over the partitioned graph: the
        owner-side bounded-window draw (sharded slot-aligned weights)
        matches the replicated sample_typed_blocks draw bit-for-bit, so
        the global-pool losses match the replicated trainer's across
        steps."""
        mesh, g, hdg, paths, model, cfg, = _weighted_setup()
        pg = PartitionedHeteroGraph.build(hdg, paths, mesh,
                                          anchor_node_type="user")
        assert set(pg.csr_w or {}) == {"item-rev_buys-user|dst",
                                       "user-buys-item|dst"}
        part = PartitionedHeteroNALPTrainer(
            model, pg, paths, cfg, mesh, capacity_factor=8.0,
            optimizer_args={"learning_rate": "0.01"},
            overflow_policy="raise")
        repl = HeteroNALPTrainer(model, hdg, paths, cfg,
                                 optimizer_args={"learning_rate": "0.01"})
        B = 16
        state_p = part.init_state(jax.random.PRNGKey(0), batch_size=B)
        state_r = repl.init_state(jax.random.PRNGKey(0), batch_size=B)
        anchors = (np.arange(3 * B).reshape(3, B)
                   % g.num_nodes["user"]).astype(np.int32)
        state_p, losses_p = part.train_steps(state_p, anchors,
                                             jax.random.PRNGKey(1))
        state_r, losses_r = repl.train_steps(state_r, anchors,
                                             jax.random.PRNGKey(1))
        np.testing.assert_allclose(np.asarray(losses_p),
                                   np.asarray(losses_r), rtol=1e-3)

    def test_weighted_live_without_weights_raises(self):
        mesh, g, hdg, paths, model, cfg = _weighted_setup()
        import dataclasses

        pg = PartitionedHeteroGraph.build(hdg, paths, mesh,
                                          anchor_node_type="user")
        pg_nw = dataclasses.replace(pg, csr_w=None)
        with pytest.raises(ValueError, match="no edge weights"):
            PartitionedHeteroNALPTrainer(model, pg_nw, paths, cfg, mesh)


class TestHeteroGrowPolicy:
    @pytest.mark.slow
    def test_grow_doubles_capacity_and_recovers(self):
        """overflow_policy='grow': a skew-overflowing chunk doubles
        capacity_factor and rebuilds the programs; subsequent chunks run
        at the larger capacity (same contract as the homogeneous
        trainer)."""
        mesh, g, hdg, paths, model, cfg, trainer = _setup()
        grow = PartitionedHeteroNALPTrainer(
            model, trainer.pg, paths, cfg, mesh, capacity_factor=0.05,
            optimizer_args={"learning_rate": "0.01"},
            overflow_policy="grow")
        B = 16
        state = grow.init_state(jax.random.PRNGKey(0), batch_size=B)
        # Skewed anchors: all point at the same few users -> one owner
        # shard's request bucket overflows at factor 0.05.
        anchors = np.zeros((1, B), np.int32)
        f0 = grow.capacity_factor
        state, _ = grow.train_steps(state, anchors,
                                    jax.random.PRNGKey(1))
        assert grow.overflow_total > 0
        assert grow.capacity_factor == 2 * f0
        # The rebuilt programs run (and can keep growing if needed).
        state, losses = grow.train_steps(state, anchors,
                                         jax.random.PRNGKey(2))
        assert np.isfinite(np.asarray(losses)).all()


class TestHeteroPartitionedFit:
    @pytest.mark.slow
    def test_fit_trains_with_val_cadence_and_early_stop(self):
        mesh, g, hdg, paths, model, cfg, trainer = _setup()
        n_users = g.num_nodes["user"]
        users = np.arange(n_users)
        state = trainer.init_state(jax.random.PRNGKey(0), batch_size=16)
        state, metrics = trainer.fit(
            state, users, users, batch_size=16, num_epochs=4,
            val_every_n_batches=4, num_val_batches=2,
            early_stop_patience=3, log_every=0)
        assert metrics["mrr"] > 0.3, metrics


class TestTabularizedEncodeBatch:
    def test_encode_batch_works_tabularized(self):
        """Regression: the encode program's spec tuple must track the
        graph-spec layout — a stale index crashed encode_batch (and
        run_partitioned_inference) on any TABULARIZED hetero trainer
        while training worked."""
        tab = TestPartitionedHeteroTabularized()
        mesh, g, hdg, paths, model, cfg, trainer = tab._setup_tab()
        state = trainer.init_state(jax.random.PRNGKey(0), batch_size=16)
        u = trainer.encode_batch(state.params, np.arange(16), "user")
        it = trainer.encode_batch(state.params, np.arange(16), "item")
        assert u.shape == (16, 16) and it.shape == (16, 16)
        assert np.isfinite(np.asarray(u)).all()
