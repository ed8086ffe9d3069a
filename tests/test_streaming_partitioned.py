"""Streaming + partitioned composition: per-shard host feature store +
routed device lookups (the GLT cluster-RAM regime,
ref dist_link_prediction_dataset.py:428-439). Loss parity vs the
HBM-resident PartitionedNALPTrainer in tabularized mode."""

import jax
import numpy as np
import pytest

from gigl_tpu.graph.csr import HeteroGraph
from gigl_tpu.models.encoders import GNNEncoder
from gigl_tpu.models.link_prediction import (
    LinkPredictionDecoder,
    LinkPredictionGNN,
)
from gigl_tpu.parallel.mesh import make_mesh
from gigl_tpu.training.dataset import DeviceGraph
from gigl_tpu.training.dist_sampled import (
    PartitionedGraph,
    PartitionedNALPTrainer,
)
from gigl_tpu.training.streaming import HostGraphStore
from gigl_tpu.training.streaming_partitioned import (
    ShardedHostStore,
    StreamingPartitionedNALPTrainer,
)
from gigl_tpu.training.trainer import NALPTrainerConfig

AXIS = "data"
N, E, D = 256, 2048, 16


def _toy(seed=0):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, N, E)
    dst = rng.integers(0, N, E)
    edges = np.stack([src, dst])
    g = HeteroGraph.homogeneous(
        src=src, dst=dst, num_nodes=N,
        node_features=rng.normal(size=(N, D)).astype(np.float32))
    dg = DeviceGraph.from_hetero(g, supervision_edges=edges)
    return dg, edges


def _model():
    enc = GNNEncoder(hid_dim=32, out_dim=16, num_layers=2,
                     conv="graphsage", dropout=0.0)
    return LinkPredictionGNN(encoder=enc, decoder=LinkPredictionDecoder())


def _cfg(**kw):
    return NALPTrainerConfig(fanouts=(5, 3), num_positives=1,
                             num_random_negs=64, loss_type="retrieval",
                             cached_hop=True, seed=7, **kw)


def _store(dg, edges, cfg, **kw):
    return HostGraphStore.build(
        message_edges=edges, supervision_edges=edges,
        features=np.asarray(dg.node_features, np.float32),
        num_nodes=N, fanouts=cfg.fanouts, seed=cfg.seed, **kw)


class TestStreamingPartitioned:
    @pytest.mark.slow
    def test_loss_parity_with_hbm_partitioned(self):
        """Same seeds -> the streamed-partitioned step computes the SAME
        losses as the HBM-resident partitioned tabularized step (draws
        bit-identical; features identical; only the hydration transport
        differs)."""
        mesh = make_mesh(8, axes=(AXIS,))
        dg, edges = _toy()
        cfg = _cfg()
        model = _model()
        batch = 64

        pg = PartitionedGraph.build(dg, mesh)
        hbm = PartitionedNALPTrainer(model, pg, mesh, cfg,
                                     capacity_factor=8.0,
                                     overflow_policy="raise")
        st = StreamingPartitionedNALPTrainer(
            model, _store(dg, edges, cfg), mesh, cfg, batch_size=batch,
            capacity_factor=8.0, overflow_policy="raise")

        state_h = hbm.init_state(jax.random.PRNGKey(0), batch_size=batch)
        state_s = st.init_state(jax.random.PRNGKey(0))
        rng = np.random.default_rng(3)
        anchors = rng.integers(0, N, (4, batch)).astype(np.int32)
        state_h, losses_h = hbm.train_steps(state_h, anchors,
                                            jax.random.PRNGKey(100))
        rngs = np.asarray(jax.random.split(jax.random.PRNGKey(100), 4))
        losses_s = []
        for i in range(4):
            state_s, l = st.train_step(state_s, anchors[i], rngs[i], i)
            losses_s.append(float(l))
        np.testing.assert_allclose(losses_s, np.asarray(losses_h),
                                   rtol=2e-5)
        assert st.overflow_total == 0
        assert hbm.overflow_total == 0

    @pytest.mark.slow
    def test_hard_negatives_and_run_steps(self):
        mesh = make_mesh(8, axes=(AXIS,))
        dg, edges = _toy()
        rng = np.random.default_rng(9)
        hard = np.stack([rng.integers(0, N, 512), rng.integers(0, N, 512)])
        cfg = _cfg(num_hard_negs=2)
        store = HostGraphStore.build(
            message_edges=edges, supervision_edges=edges,
            features=np.asarray(dg.node_features, np.float32),
            num_nodes=N, fanouts=cfg.fanouts, seed=cfg.seed,
            hard_neg_edges=hard)
        st = StreamingPartitionedNALPTrainer(
            _model(), store, mesh, cfg, batch_size=32,
            capacity_factor=8.0, overflow_policy="raise")
        state = st.init_state(jax.random.PRNGKey(0))
        batches = rng.integers(0, N, (3, 32)).astype(np.int32)
        state, losses = st.run_steps(state, batches, jax.random.PRNGKey(1))
        assert losses.shape == (3,)
        assert np.isfinite(losses).all()

    def test_sharded_host_store_holds_local_rows_only(self):
        """The per-process store materializes ONLY its shards' rows (the
        beyond-HBM capacity contract)."""
        dg, edges = _toy()
        cfg = _cfg()
        store = _store(dg, edges, cfg)
        sub = ShardedHostStore.from_host_store(store, num_shards=8,
                                               local_shards=[2, 5])
        rows = -(-N // 8)
        assert sub._np.shape == (2 * rows, 2 * D + 1)
        ids = np.arange(2 * rows, 3 * rows)
        out = sub.answer_shard(2, ids)
        np.testing.assert_allclose(out[:, :D], store.features.gather(ids))
        np.testing.assert_allclose(out[:, D], store.degrees[ids])
        np.testing.assert_allclose(out[:, D + 1:], store.agg.gather(ids))

    def test_config_validation(self):
        dg, edges = _toy()
        mesh = make_mesh(8, axes=(AXIS,))
        store = _store(dg, edges, _cfg())
        with pytest.raises(ValueError, match="cached_hop"):
            StreamingPartitionedNALPTrainer(
                _model(), store, mesh,
                NALPTrainerConfig(fanouts=(5, 3), num_random_negs=64),
                batch_size=32)
        with pytest.raises(ValueError, match="retrieval-loss"):
            StreamingPartitionedNALPTrainer(
                _model(), store, mesh,
                NALPTrainerConfig(fanouts=(5, 3), num_random_negs=64,
                                  loss_type="margin", cached_hop=True,
                                  seed=7, global_candidate_pool=True),
                batch_size=32)
        with pytest.raises(ValueError, match="divisible"):
            StreamingPartitionedNALPTrainer(_model(), store, mesh, _cfg(),
                                            batch_size=30)
        with pytest.raises(ValueError, match="hard_neg"):
            StreamingPartitionedNALPTrainer(
                _model(), store, mesh, _cfg(num_hard_negs=2),
                batch_size=32)


class TestStreamingPartitionedEval:
    @pytest.mark.slow
    def test_evaluate_parity_with_hbm_partitioned(self):
        """Same draws -> same ranking metrics as the HBM-resident
        partitioned trainer's evaluate."""
        mesh = make_mesh(8, axes=(AXIS,))
        dg, edges = _toy()
        cfg = _cfg()
        model = _model()
        batch = 64
        hbm = PartitionedNALPTrainer(
            model, PartitionedGraph.build(dg, mesh), mesh, cfg,
            capacity_factor=8.0, overflow_policy="raise")
        st = StreamingPartitionedNALPTrainer(
            model, _store(dg, edges, cfg), mesh, cfg, batch_size=batch,
            capacity_factor=8.0, overflow_policy="raise")
        state = hbm.init_state(jax.random.PRNGKey(0), batch_size=batch)
        rng = np.random.default_rng(4)
        anchors = rng.integers(0, N, batch).astype(np.int32)
        m_h = hbm.evaluate(state.params, [anchors], step=3)
        m_s = st.evaluate(state.params, [anchors], step=3)
        for k in m_h:
            np.testing.assert_allclose(m_s[k], m_h[k], rtol=2e-5,
                                       err_msg=k)


class TestStreamingPartitionedRingAndBf16:
    @pytest.mark.slow
    def test_ring_global_pool_parity_with_hbm(self):
        """global_candidate_pool on the streamed-partitioned path computes
        the same ring losses as the HBM partitioned trainer."""
        mesh = make_mesh(8, axes=(AXIS,))
        dg, edges = _toy()
        cfg = _cfg(global_candidate_pool=True)
        model = _model()
        batch = 64
        hbm = PartitionedNALPTrainer(
            model, PartitionedGraph.build(dg, mesh), mesh, cfg,
            capacity_factor=8.0, overflow_policy="raise")
        st = StreamingPartitionedNALPTrainer(
            model, _store(dg, edges, cfg), mesh, cfg, batch_size=batch,
            capacity_factor=8.0, overflow_policy="raise")
        state_h = hbm.init_state(jax.random.PRNGKey(0), batch_size=batch)
        state_s = st.init_state(jax.random.PRNGKey(0))
        rng = np.random.default_rng(5)
        anchors = rng.integers(0, N, (3, batch)).astype(np.int32)
        state_h, losses_h = hbm.train_steps(state_h, anchors,
                                            jax.random.PRNGKey(7))
        rngs = np.asarray(jax.random.split(jax.random.PRNGKey(7), 3))
        losses_s = []
        for i in range(3):
            state_s, l = st.train_step(state_s, anchors[i], rngs[i], i)
            losses_s.append(float(l))
        np.testing.assert_allclose(losses_s, np.asarray(losses_h),
                                   rtol=2e-5)

    def test_bfloat16_answers_train_close_to_fp32(self):
        mesh = make_mesh(8, axes=(AXIS,))
        dg, edges = _toy()
        cfg = _cfg()
        model = _model()
        st32 = StreamingPartitionedNALPTrainer(
            model, _store(dg, edges, cfg), mesh, cfg, batch_size=32,
            capacity_factor=8.0, overflow_policy="raise")
        st16 = StreamingPartitionedNALPTrainer(
            model, _store(dg, edges, cfg), mesh, cfg, batch_size=32,
            capacity_factor=8.0, overflow_policy="raise",
            answer_dtype="bfloat16")
        s32 = st32.init_state(jax.random.PRNGKey(0))
        s16 = st16.init_state(jax.random.PRNGKey(0))
        a = np.random.default_rng(6).integers(0, N, 32).astype(np.int32)
        r = np.asarray(jax.random.PRNGKey(1))
        _, l32 = st32.train_step(s32, a, r, 0)
        _, l16 = st16.train_step(s16, a, r, 0)
        np.testing.assert_allclose(float(l16), float(l32), rtol=0.05)


class TestStreamingPartitionedCms:
    @pytest.mark.slow
    def test_cms_parity_with_hbm_ring(self):
        """use_cms_correction over the streamed-partitioned ring path:
        losses AND sketch state match the HBM partitioned trainer."""
        mesh = make_mesh(8, axes=(AXIS,))
        dg, edges = _toy()
        cfg = _cfg(global_candidate_pool=True, use_cms_correction=True)
        model = _model()
        batch = 64
        hbm = PartitionedNALPTrainer(
            model, PartitionedGraph.build(dg, mesh), mesh, cfg,
            capacity_factor=8.0, overflow_policy="raise")
        st = StreamingPartitionedNALPTrainer(
            model, _store(dg, edges, cfg), mesh, cfg, batch_size=batch,
            capacity_factor=8.0, overflow_policy="raise")
        state_h = hbm.init_state(jax.random.PRNGKey(0), batch_size=batch)
        state_s = st.init_state(jax.random.PRNGKey(0))
        rng = np.random.default_rng(8)
        anchors = rng.integers(0, N, (3, batch)).astype(np.int32)
        state_h, losses_h = hbm.train_steps(state_h, anchors,
                                            jax.random.PRNGKey(2))
        rngs = np.asarray(jax.random.split(jax.random.PRNGKey(2), 3))
        losses_s = []
        for i in range(3):
            state_s, l = st.train_step(state_s, anchors[i], rngs[i], i)
            losses_s.append(float(l))
        np.testing.assert_allclose(losses_s, np.asarray(losses_h),
                                   rtol=2e-5)
        np.testing.assert_array_equal(
            np.asarray(state_s.cms.table), np.asarray(state_h.cms.table))


class TestStreamingPartitionedLabelEdgeFeatures:
    @staticmethod
    def _ef_setup(cfg, hard=True):
        """Graph whose supervision/hard-neg edges carry features, built
        for BOTH the HBM path (DeviceGraph) and the streamed path
        (HostGraphStore) from the same edge lists."""
        rng = np.random.default_rng(11)
        src = rng.integers(0, N, E)
        dst = rng.integers(0, N, E)
        edges = np.stack([src, dst])
        sup_ef = np.stack([src, dst, src + dst], 1).astype(np.float32)
        hard_edges = np.stack([dst, src]) if hard else None
        hard_ef = (np.stack([dst, src, dst - src], 1).astype(np.float32)
                   if hard else None)
        g = HeteroGraph.homogeneous(
            src=src, dst=dst, num_nodes=N,
            node_features=rng.normal(size=(N, D)).astype(np.float32))
        dg = DeviceGraph.from_hetero(
            g, supervision_edges=edges, hard_neg_edges=hard_edges,
            supervision_edge_features=sup_ef,
            hard_neg_edge_features=hard_ef)
        store = HostGraphStore.build(
            message_edges=edges, supervision_edges=edges,
            features=np.asarray(dg.node_features, np.float32),
            num_nodes=N, fanouts=cfg.fanouts, seed=cfg.seed,
            hard_neg_edges=hard_edges,
            supervision_edge_features=sup_ef,
            hard_neg_edge_features=hard_ef)
        return dg, store

    @staticmethod
    def _ef_model():
        from gigl_tpu.models.link_prediction import EdgeFeatureScorer

        enc = GNNEncoder(hid_dim=32, out_dim=16, num_layers=2,
                         conv="graphsage", dropout=0.0)
        return LinkPredictionGNN(encoder=enc,
                                 decoder=LinkPredictionDecoder(),
                                 edge_scorer=EdgeFeatureScorer(hidden_dim=8))

    @pytest.mark.slow
    def test_edge_feature_loss_parity_with_hbm(self):
        """Label-edge features hydrate owner-side along the routed draws:
        the streamed-partitioned step computes the SAME losses as the
        HBM partitioned step with an edge scorer in the model."""
        mesh = make_mesh(8, axes=(AXIS,))
        cfg = _cfg(num_hard_negs=2)
        dg, store = self._ef_setup(cfg)
        model = self._ef_model()
        batch = 64
        hbm = PartitionedNALPTrainer(
            model, PartitionedGraph.build(dg, mesh), mesh, cfg,
            capacity_factor=8.0, overflow_policy="raise")
        st = StreamingPartitionedNALPTrainer(
            model, store, mesh, cfg, batch_size=batch,
            capacity_factor=8.0, overflow_policy="raise")
        state_h = hbm.init_state(jax.random.PRNGKey(0), batch_size=batch)
        state_s = st.init_state(jax.random.PRNGKey(0))
        anchors = np.random.default_rng(12).integers(
            0, N, (3, batch)).astype(np.int32)
        state_h, losses_h = hbm.train_steps(state_h, anchors,
                                            jax.random.PRNGKey(3))
        rngs = np.asarray(jax.random.split(jax.random.PRNGKey(3), 3))
        losses_s = []
        for i in range(3):
            state_s, l = st.train_step(state_s, anchors[i], rngs[i], i)
            losses_s.append(float(l))
        np.testing.assert_allclose(losses_s, np.asarray(losses_h),
                                   rtol=2e-5)

    @pytest.mark.slow
    def test_edge_feature_ring_parity_with_hbm(self):
        """Ring global pool + edge scorer: the own-block edge bias rides
        the streamed-partitioned ring loss exactly like the HBM ring."""
        mesh = make_mesh(8, axes=(AXIS,))
        cfg = _cfg(num_hard_negs=2, global_candidate_pool=True)
        dg, store = self._ef_setup(cfg)
        model = self._ef_model()
        batch = 64
        hbm = PartitionedNALPTrainer(
            model, PartitionedGraph.build(dg, mesh), mesh, cfg,
            capacity_factor=8.0, overflow_policy="raise")
        st = StreamingPartitionedNALPTrainer(
            model, store, mesh, cfg, batch_size=batch,
            capacity_factor=8.0, overflow_policy="raise")
        state_h = hbm.init_state(jax.random.PRNGKey(0), batch_size=batch)
        state_s = st.init_state(jax.random.PRNGKey(0))
        anchors = np.random.default_rng(13).integers(
            0, N, (2, batch)).astype(np.int32)
        state_h, losses_h = hbm.train_steps(state_h, anchors,
                                            jax.random.PRNGKey(4))
        rngs = np.asarray(jax.random.split(jax.random.PRNGKey(4), 2))
        losses_s = []
        for i in range(2):
            state_s, l = st.train_step(state_s, anchors[i], rngs[i], i)
            losses_s.append(float(l))
        np.testing.assert_allclose(losses_s, np.asarray(losses_h),
                                   rtol=2e-5)


class TestTypedStreamingPartitioned:
    """TYPED beyond-HBM composition (r4 VERDICT missing 3): per-node-type
    sharded HOST feature stores + the plan/host/apply split of the typed
    partitioned step. Draws are bit-identical to
    PartitionedHeteroNALPTrainer, so losses match exactly."""

    @staticmethod
    def _typed_setup(tabularized=False):
        from gigl_tpu.config.task_config import SamplingOp
        from gigl_tpu.data.mocking import (
            BIPARTITE_TOY_GRAPH_LP,
            get_mocked_graph,
        )
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
            HeteroNALPTrainerConfig,
        )
        from gigl_tpu.types.graph import EdgeType

        mesh = make_mesh(8)
        g = get_mocked_graph(BIPARTITE_TOY_GRAPH_LP)
        buys = EdgeType("user", "buys", "item")
        rev = EdgeType("item", "rev_buys", "user")
        user_ops = [
            SamplingOp(op_name="u_items", edge_type=rev,
                       num_nodes_to_sample=5,
                       sampling_direction="INCOMING"),
            SamplingOp(op_name="u_items_users", edge_type=buys,
                       num_nodes_to_sample=3, input_op_names=("u_items",),
                       sampling_direction="INCOMING"),
        ]
        item_ops = [
            SamplingOp(op_name="i_users", edge_type=buys,
                       num_nodes_to_sample=5,
                       sampling_direction="INCOMING"),
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
        cfg = HeteroNALPTrainerConfig(
            anchor_node_type="user", candidate_node_type="item",
            num_random_negs=32, loss_type="retrieval", temperature=0.1,
            tabularized=tabularized)
        pg_hbm = PartitionedHeteroGraph.build(hdg, paths, mesh,
                                              anchor_node_type="user")
        pg_host = PartitionedHeteroGraph.build(
            hdg, paths, mesh, anchor_node_type="user",
            features_on_device=False)
        if tabularized:
            pg_hbm = pg_hbm.with_sample_tables(hdg, paths, mesh)
            pg_host = pg_host.with_sample_tables(hdg, paths, mesh)
        host_features = {nt: np.asarray(f) for nt, f
                         in hdg.node_features.items()}
        hbm = PartitionedHeteroNALPTrainer(
            model, pg_hbm, paths, cfg, mesh, capacity_factor=8.0,
            optimizer_args={"learning_rate": "0.01"})
        from gigl_tpu.training.streaming_partitioned import (
            StreamingPartitionedHeteroNALPTrainer,
        )

        st = StreamingPartitionedHeteroNALPTrainer(
            model, pg_host, paths, cfg, mesh, batch_size=32,
            host_features=host_features, capacity_factor=8.0,
            overflow_policy="raise",
            optimizer_args={"learning_rate": "0.01"})
        return g, hbm, st

    def test_step_runs_and_no_device_feats(self):
        g, hbm, st = self._typed_setup()
        assert st.pg.feats == {}  # beyond-HBM: nothing uploaded
        state = st.init_state(jax.random.PRNGKey(0), batch_size=32)
        batches = (np.arange(2 * 32).reshape(2, 32)
                   % g.num_nodes["user"]).astype(np.int32)
        state, losses = st.run_steps(state, batches, jax.random.PRNGKey(1))
        assert losses.shape == (2,)
        assert np.isfinite(losses).all()

    @pytest.mark.slow
    @pytest.mark.parametrize("tabularized", [False, True])
    def test_loss_parity_with_hbm_typed(self, tabularized):
        """Same seeds -> the typed streamed-partitioned step computes the
        SAME losses as the HBM typed partitioned step (bit-identical
        draws; only the feature hydration transport differs)."""
        g, hbm, st = self._typed_setup(tabularized)
        B, K = 32, 3
        state_h = hbm.init_state(jax.random.PRNGKey(0), batch_size=B)
        state_s = st.init_state(jax.random.PRNGKey(0), batch_size=B)
        n_users = g.num_nodes["user"]
        batches = ((np.arange(K * B).reshape(K, B) * 7)
                   % n_users).astype(np.int32)
        state_h, losses_h = hbm.train_steps(state_h, batches,
                                            jax.random.PRNGKey(1))
        state_s, losses_s = st.run_steps(state_s, batches,
                                         jax.random.PRNGKey(1))
        np.testing.assert_allclose(np.asarray(losses_h), losses_s,
                                   rtol=2e-5)
        # Eval parity too.
        ev_h = hbm.evaluate(state_h.params, [batches[0]], step=100)
        ev_s = st.evaluate(state_s.params, [batches[0]], step=100)
        assert ev_h["mrr"] == pytest.approx(ev_s["mrr"], rel=2e-4)


class TestFastBf16Cast:
    def test_bit_identical_to_ml_dtypes(self):
        """The vectorized f32->bf16 cast (utils/cast.py) must be
        bit-identical to ml_dtypes' own RNE conversion — including
        subnormals, halfway-rounding cases, infs, and NaN quieting."""
        import ml_dtypes

        from gigl_tpu.utils.cast import to_bfloat16

        rng = np.random.default_rng(0)
        x = np.concatenate([
            rng.standard_normal(100_000).astype(np.float32),
            rng.standard_normal(1000).astype(np.float32) * 1e-40,
            rng.standard_normal(1000).astype(np.float32) * 1e38,
            np.array([0.0, -0.0, np.inf, -np.inf, np.nan,
                      1.0, 1.0039062, 1.0039063, 1.0078125], np.float32),
            # exact halfway cases (lower 16 bits == 0x8000)
            np.array([1, 3, 5, 7], np.uint32).__lshift__(15)
            .view(np.float32),
        ])
        got = to_bfloat16(x).view(np.uint16)
        want = x.astype(ml_dtypes.bfloat16).view(np.uint16)
        nan = np.isnan(x)
        np.testing.assert_array_equal(got[~nan], want[~nan])
        assert np.isnan(to_bfloat16(x).astype(np.float32)[nan]).all()

    def test_streamed_answers_use_fast_cast(self):
        import ml_dtypes

        from gigl_tpu.utils.cast import to_bfloat16

        from gigl_tpu.utils.cast import answer_cast

        assert answer_cast(ml_dtypes.bfloat16) is to_bfloat16


class TestEncodeParityWithHBM:
    def test_streamed_encode_matches_hbm_encode(self):
        """The anchors-only inference plan must produce the SAME
        embeddings as the HBM partitioned trainer's encode_batch (same
        frozen tables, same draws, only the hydration transport and the
        plan's group set differ)."""
        dg, edges = _toy()
        mesh = make_mesh(8)
        cfg = _cfg()
        model = _model()
        store = _store(dg, edges, cfg)
        hbm = PartitionedNALPTrainer(
            model, PartitionedGraph.build(dg, mesh), mesh, cfg,
            capacity_factor=8.0)
        st = StreamingPartitionedNALPTrainer(
            model, store, mesh, cfg, batch_size=32, capacity_factor=8.0,
            overflow_policy="raise")
        state = hbm.init_state(jax.random.PRNGKey(0), batch_size=32)
        ids = np.arange(50, dtype=np.int32)  # not a batch multiple
        a = np.asarray(hbm.encode_batch(state.params, ids))
        b = st.encode_batch(state.params, ids)
        np.testing.assert_allclose(a, b, rtol=2e-5, atol=1e-6)
        # empty input contract
        z = st.encode_batch(state.params, np.array([], np.int32))
        assert z.shape == (0, a.shape[1])


class TestStreamingPartitionedNodeClassification:
    """Beyond-HBM node classification: sharded HOST features + routed
    lookups; labels row-sharded in device HBM (adjacency-scale bytes).
    Draws are bit-compatible with PartitionedNodeClassificationTrainer
    in tabularized mode, so losses match exactly."""

    @staticmethod
    def _nc_setup():
        from gigl_tpu.training.dist_sampled import (
            PartitionedNodeClassificationTrainer,
        )
        from gigl_tpu.training.streaming_partitioned import (
            StreamingPartitionedNodeClassificationTrainer,
        )
        from gigl_tpu.training.trainer import (
            NodeClassificationTrainerConfig,
        )

        rng = np.random.default_rng(0)
        src, dst = rng.integers(0, N, E), rng.integers(0, N, E)
        edges = np.stack([src, dst])
        labels = (np.arange(N) % 4)
        g = HeteroGraph.homogeneous(
            src=src, dst=dst, num_nodes=N,
            node_features=rng.normal(size=(N, D)).astype(np.float32),
            node_labels=labels)
        dg = DeviceGraph.from_hetero(g)
        store = HostGraphStore.build(
            message_edges=edges, supervision_edges=edges,
            features=np.asarray(dg.node_features, np.float32),
            num_nodes=N, fanouts=(5, 3), seed=7, node_labels=labels)
        mesh = make_mesh(8)
        cfg = NodeClassificationTrainerConfig(fanouts=(5, 3),
                                              cached_hop=True, seed=7)
        enc = GNNEncoder(hid_dim=32, out_dim=4, num_layers=2,
                         conv="graphsage", dropout=0.0)
        hbm = PartitionedNodeClassificationTrainer(
            enc, PartitionedGraph.build(dg, mesh), mesh, cfg,
            capacity_factor=8.0, optimizer_args={"learning_rate": "0.01"})
        st = StreamingPartitionedNodeClassificationTrainer(
            enc, store, mesh, cfg, batch_size=32, capacity_factor=8.0,
            overflow_policy="raise",
            optimizer_args={"learning_rate": "0.01"})
        return hbm, st

    @pytest.mark.slow
    def test_loss_and_eval_parity_with_hbm(self):
        hbm, st = self._nc_setup()
        B, K = 32, 3
        state_h = hbm.init_state(jax.random.PRNGKey(0), batch_size=B)
        state_s = st.init_state(jax.random.PRNGKey(0))
        batches = ((np.arange(K * B).reshape(K, B) * 11) % N).astype(
            np.int32)
        state_h, losses_h = hbm.train_steps(state_h, batches,
                                            jax.random.PRNGKey(1))
        state_s, losses_s = st.run_steps(state_s, list(batches),
                                         jax.random.PRNGKey(1))
        np.testing.assert_allclose(np.asarray(losses_h), losses_s,
                                   rtol=2e-5)
        val = np.arange(64, dtype=np.int32)
        acc_h = hbm.evaluate(state_h.params, [val])
        acc_s = st.evaluate(state_s.params, [val[:32], val[32:]])
        assert acc_h == pytest.approx(acc_s, abs=1e-6)
        # logits parity on the inference path
        lg_h = np.asarray(hbm.predict_batch(state_h.params,
                                            np.arange(20)))
        lg_s = st.predict_batch(state_s.params, np.arange(20))
        np.testing.assert_allclose(lg_h, lg_s, rtol=2e-5, atol=1e-6)

    def test_learns(self):
        _, st = self._nc_setup()
        state = st.init_state(jax.random.PRNGKey(0))
        state, m = st.fit(state, np.arange(N), np.arange(64),
                          num_epochs=4, log_every=0)
        assert m["accuracy"] > 0.4, m

    def test_requires_labels(self):
        from gigl_tpu.training.streaming_partitioned import (
            StreamingPartitionedNodeClassificationTrainer,
        )
        from gigl_tpu.training.trainer import (
            NodeClassificationTrainerConfig,
        )

        dg, edges = _toy()
        store = _store(dg, edges, _cfg())
        enc = GNNEncoder(hid_dim=16, out_dim=4, num_layers=2,
                         conv="graphsage", dropout=0.0)
        with pytest.raises(ValueError, match="node_labels"):
            StreamingPartitionedNodeClassificationTrainer(
                enc, store, make_mesh(8),
                NodeClassificationTrainerConfig(fanouts=(5, 3),
                                                cached_hop=True),
                batch_size=32)
