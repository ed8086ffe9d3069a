"""Label (supervision) edge features through the NALP path.

Ref contract: batches carry per-positive / per-hard-negative supervision
edge features (nalp_data_loader.py:44-46,184-192 label_edge_features), and
a task spec may fold them into supervision-edge scoring. Here:
DeviceGraph.from_hetero(supervision_edge_features=...) -> NALPBatch
.pos_edge_feats/.hard_neg_edge_feats -> LinkPredictionGNN.decode(...,
edge_feats=) via EdgeFeatureScorer.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gigl_tpu.graph.csr import HeteroGraph
from gigl_tpu.models.encoders import GNNEncoder
from gigl_tpu.models.link_prediction import (
    DecoderType,
    EdgeFeatureScorer,
    LinkPredictionDecoder,
    LinkPredictionGNN,
)
from gigl_tpu.training.dataset import DeviceGraph
from gigl_tpu.training.trainer import NALPTrainer, NALPTrainerConfig


def _graph_with_label_edge_feats(n=120, e=900, d=8, de=3, seed=0):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    g = HeteroGraph.homogeneous(
        src=src, dst=dst, num_nodes=n,
        node_features=rng.normal(size=(n, d)).astype(np.float32))
    sup = np.stack([src, dst])
    # Edge feature encodes its endpoints -> hydration is checkable.
    sup_ef = np.stack([src, dst, src + dst], 1).astype(np.float32)
    hard = np.stack([dst, src])
    hard_ef = np.stack([dst, src, dst - src], 1).astype(np.float32)
    dg = DeviceGraph.from_hetero(
        g, supervision_edges=sup, hard_neg_edges=hard,
        supervision_edge_features=sup_ef, hard_neg_edge_features=hard_ef)
    return dg, n


def _model(edge_scorer=True, decoder_type=DecoderType.INNER_PRODUCT):
    enc = GNNEncoder(hid_dim=16, out_dim=8, num_layers=2, conv="graphsage",
                     dropout=0.0)
    return LinkPredictionGNN(
        encoder=enc,
        decoder=LinkPredictionDecoder(decoder_type=decoder_type),
        edge_scorer=EdgeFeatureScorer(hidden_dim=8) if edge_scorer else None)


class TestHydration:
    def test_pos_edge_feats_match_sampled_edge(self):
        dg, n = _graph_with_label_edge_feats()
        anchors = jnp.arange(32, dtype=jnp.int32)
        batch = dg.sample_nalp_batch(anchors, num_positives=2,
                                     num_hard_negs=2, seed=3, step=5)
        assert batch.pos_edge_feats.shape == (32, 2, 3)
        assert batch.hard_neg_edge_feats.shape == (32, 2, 3)
        pos_ef = np.asarray(batch.pos_edge_feats)
        pos = np.asarray(batch.pos)
        mask = np.asarray(batch.pos_mask)
        a = np.asarray(batch.anchors)
        # Supervision CSR anchors on dst: edge (src=pos, dst=anchor);
        # feature row was [src, dst, src+dst].
        np.testing.assert_array_equal(pos_ef[mask][:, 0],
                                      pos[mask].astype(np.float32))
        np.testing.assert_array_equal(
            pos_ef[mask][:, 1],
            np.broadcast_to(a[:, None], pos.shape)[mask].astype(np.float32))

    def test_absent_features_stay_none(self):
        rng = np.random.default_rng(1)
        src = rng.integers(0, 50, 200)
        dst = rng.integers(0, 50, 200)
        g = HeteroGraph.homogeneous(
            src=src, dst=dst, num_nodes=50,
            node_features=rng.normal(size=(50, 4)).astype(np.float32))
        dg = DeviceGraph.from_hetero(g,
                                     supervision_edges=np.stack([src, dst]))
        batch = dg.sample_nalp_batch(jnp.arange(8), num_positives=1)
        assert batch.pos_edge_feats is None
        assert batch.hard_neg_edge_feats is None

    def test_requires_matching_edges(self):
        rng = np.random.default_rng(1)
        src = rng.integers(0, 50, 200)
        dst = rng.integers(0, 50, 200)
        g = HeteroGraph.homogeneous(
            src=src, dst=dst, num_nodes=50,
            node_features=rng.normal(size=(50, 4)).astype(np.float32))
        with pytest.raises(ValueError, match="supervision_edge"):
            DeviceGraph.from_hetero(
                g, supervision_edge_features=np.ones((200, 2), np.float32))


class TestScoring:
    def test_margin_pos_scores_shift_by_edge_score(self):
        """decode(q, pos, ef) == decode(q, pos) + edge_score(ef) exactly."""
        dg, n = _graph_with_label_edge_feats()
        model = _model()
        cfg = NALPTrainerConfig(fanouts=(4, 2), num_positives=1,
                                num_hard_negs=2, num_random_negs=16,
                                loss_type="margin")
        trainer = NALPTrainer(model, dg, cfg)
        state = trainer.init_state(jax.random.PRNGKey(0), batch_size=8)
        batch = dg.sample_nalp_batch(jnp.arange(8), num_positives=1,
                                     num_hard_negs=2, num_random_negs=16)
        q = trainer._encode_impl(dg, state.params, batch.anchors, 0, False)
        pos = trainer._encode_impl(dg, state.params, batch.pos, 1, False)
        base = model.apply(state.params, q[:, None, :], pos,
                           method="decode")
        with_ef = model.apply(state.params, q[:, None, :], pos,
                              batch.pos_edge_feats, method="decode")
        eterm = model.apply(state.params,
                            batch.pos_edge_feats.reshape(-1, 3),
                            method="edge_score").reshape(8, 1)
        np.testing.assert_allclose(np.asarray(with_ef),
                                   np.asarray(base) + np.asarray(eterm),
                                   rtol=1e-5, atol=1e-6)

    @pytest.mark.parametrize("loss_type", ["retrieval", "margin"])
    def test_edge_features_change_the_loss(self, loss_type):
        dg, n = _graph_with_label_edge_feats()
        model = _model()
        cfg = NALPTrainerConfig(fanouts=(4, 2), num_positives=1,
                                num_hard_negs=2, num_random_negs=16,
                                loss_type=loss_type)
        trainer = NALPTrainer(model, dg, cfg)
        state = trainer.init_state(jax.random.PRNGKey(0), batch_size=8)
        import dataclasses

        dg_no_ef = dataclasses.replace(dg, sup_edge_features=None,
                                       hard_neg_edge_features=None)
        t2 = NALPTrainer(model, dg_no_ef, cfg)
        anchors = np.arange(8, dtype=np.int32)
        params0 = jax.tree_util.tree_map(jnp.copy, state.params)
        _, loss_with = trainer.train_step(state, anchors,
                                          jax.random.PRNGKey(1))
        st2 = t2.init_state(jax.random.PRNGKey(0), batch_size=8,
                            params=params0)
        _, loss_without = t2.train_step(st2, anchors, jax.random.PRNGKey(1))
        assert np.isfinite(float(loss_with))
        assert float(loss_with) != pytest.approx(float(loss_without))

    def test_trains_and_evaluates_with_edge_features(self):
        dg, n = _graph_with_label_edge_feats()
        model = _model()
        cfg = NALPTrainerConfig(fanouts=(4, 2), num_positives=1,
                                num_hard_negs=1, num_random_negs=16,
                                loss_type="retrieval")
        trainer = NALPTrainer(model, dg, cfg,
                              optimizer_args={"learning_rate": "1e-2"})
        state = trainer.init_state(jax.random.PRNGKey(0), batch_size=16)
        rng = np.random.default_rng(2)
        anchors = rng.integers(0, n, (10, 16)).astype(np.int32)
        state, losses = trainer.train_steps(state, anchors,
                                            jax.random.PRNGKey(1))
        assert np.isfinite(np.asarray(losses)).all()
        metrics = trainer.evaluate(state.params, anchors[:2])
        assert 0.0 <= metrics["mrr"] <= 1.0


class TestMLPDecoderInit:
    def test_mlp_decoder_params_created_by_warmup(self):
        """Regression: model.init used to touch only the encoder, so MLP
        decoder types crashed at decode time inside trainers."""
        dg, n = _graph_with_label_edge_feats()
        model = _model(edge_scorer=False,
                       decoder_type=DecoderType.HADAMARD_MLP)
        cfg = NALPTrainerConfig(fanouts=(4, 2), num_random_negs=16)
        trainer = NALPTrainer(model, dg, cfg)
        state = trainer.init_state(jax.random.PRNGKey(0), batch_size=8)
        assert "decoder" in state.params["params"]
        state, loss = trainer.train_step(state, np.arange(8),
                                         jax.random.PRNGKey(1))
        assert np.isfinite(float(loss))


# ---------------------------------------------------------------------------
# heterogeneous paths (replicated + partitioned)
# ---------------------------------------------------------------------------

def _hetero_setup(edge_scorer=True, num_hard_negs=0):
    from gigl_tpu.config.task_config import SamplingOp
    from gigl_tpu.data.mocking import (
        BIPARTITE_TOY_GRAPH_LP,
        get_mocked_graph,
    )
    from gigl_tpu.models.hetero_encoders import HeteroGNNEncoder
    from gigl_tpu.models.link_prediction import HeteroLinkPredictionGNN
    from gigl_tpu.sampling.hetero_sampler import resolve_path
    from gigl_tpu.training.hetero_dataset import HeteroDeviceGraph
    from gigl_tpu.training.hetero_trainer import HeteroNALPTrainerConfig
    from gigl_tpu.types.graph import EdgeType

    g = get_mocked_graph(BIPARTITE_TOY_GRAPH_LP)
    buys = EdgeType("user", "buys", "item")
    rev = EdgeType("item", "rev_buys", "user")
    paths = {
        "user": resolve_path("user", [
            SamplingOp(op_name="u1", edge_type=rev, num_nodes_to_sample=5,
                       sampling_direction="INCOMING"),
            SamplingOp(op_name="u2", edge_type=buys,
                       num_nodes_to_sample=3, input_op_names=("u1",),
                       sampling_direction="INCOMING")]),
        "item": resolve_path("item", [
            SamplingOp(op_name="i1", edge_type=buys, num_nodes_to_sample=5,
                       sampling_direction="INCOMING"),
            SamplingOp(op_name="i2", edge_type=rev,
                       num_nodes_to_sample=3, input_op_names=("i1",),
                       sampling_direction="INCOMING")]),
    }
    sup = g.edges[buys]
    rng = np.random.default_rng(5)
    # feature encodes the endpoints -> hydration checkable
    sup_ef = np.stack([sup[0], sup[1], sup[0] + sup[1]], 1).astype(
        np.float32)
    kw = {}
    hard = None
    if num_hard_negs:
        hard = np.stack([rng.integers(0, g.num_nodes["user"], 300),
                         rng.integers(0, g.num_nodes["item"], 300)])
        kw = dict(hard_neg_edges=np.stack([hard[0], hard[1]]),
                  hard_neg_edge_features=np.stack(
                      [hard[0], hard[1], hard[0] - hard[1]], 1).astype(
                          np.float32))
    hdg = HeteroDeviceGraph.from_hetero(
        g, paths, supervision_edge_type=buys, supervision_edges=sup,
        supervision_anchor="src", supervision_edge_features=sup_ef, **kw)
    enc = HeteroGNNEncoder(
        hid_dim=32, out_dim=16, num_layers=2, conv="rgcn", num_bases=2,
        node_types=("user", "item"),
        edge_types=("user-buys-item", "item-rev_buys-user"))
    model = HeteroLinkPredictionGNN(
        encoder=enc, decoder=LinkPredictionDecoder(),
        edge_scorer=EdgeFeatureScorer() if edge_scorer else None)
    cfg = HeteroNALPTrainerConfig(
        anchor_node_type="user", candidate_node_type="item",
        num_random_negs=32, num_hard_negs=num_hard_negs,
        loss_type="retrieval", temperature=0.1)
    return g, hdg, paths, model, cfg, sup, sup_ef


class TestHeteroLabelEdgeFeatures:
    def test_hydrated_features_match_sampled_edge(self):
        """The pos_edge_feats rows are the features of the exact sampled
        supervision edge (feature encodes its endpoints)."""
        from gigl_tpu.training.hetero_trainer import HeteroNALPTrainer

        g, hdg, paths, model, cfg, sup, sup_ef = _hetero_setup()
        tr = HeteroNALPTrainer(model, hdg, paths, cfg)
        anchors = jnp.arange(16, dtype=jnp.int32)
        batch = tr._sample_batch(hdg, anchors, num_hard_negs=0,
                                 seed=cfg.seed, step=0)
        assert batch.pos_edge_feats is not None
        ef = np.asarray(batch.pos_edge_feats)
        pos = np.asarray(batch.pos)
        mask = np.asarray(batch.pos_mask)
        for i in range(16):
            for j in range(cfg.num_positives):
                if mask[i, j]:
                    assert ef[i, j, 0] == i          # anchor (src)
                    assert ef[i, j, 1] == pos[i, j]  # sampled item (dst)

    @pytest.mark.slow
    def test_scorer_changes_the_loss(self):
        from gigl_tpu.training.hetero_trainer import HeteroNALPTrainer

        g, hdg, paths, model, cfg, *_ = _hetero_setup(edge_scorer=True)
        g2, hdg2, paths2, model2, cfg2, *_ = _hetero_setup(
            edge_scorer=False)
        anchors = np.arange(16, dtype=np.int32)[None, :]
        tr1 = HeteroNALPTrainer(model, hdg, paths, cfg)
        tr2 = HeteroNALPTrainer(model2, hdg2, paths2, cfg2)
        s1 = tr1.init_state(jax.random.PRNGKey(0), batch_size=16)
        s2 = tr2.init_state(jax.random.PRNGKey(0), batch_size=16)
        _, l1 = tr1.train_steps(s1, anchors, jax.random.PRNGKey(1))
        _, l2 = tr2.train_steps(s2, anchors, jax.random.PRNGKey(1))
        assert float(l1[0]) != pytest.approx(float(l2[0]), rel=1e-6)

    @pytest.mark.slow
    def test_partitioned_parity_with_replicated(self):
        """Partitioned hetero trainer with owner-side label-edge-feature
        hydration + ring own-block bias matches the replicated trainer's
        global-pool losses across steps."""
        import dataclasses

        from gigl_tpu.parallel.mesh import make_mesh
        from gigl_tpu.training.dist_hetero import (
            PartitionedHeteroGraph,
            PartitionedHeteroNALPTrainer,
        )
        from gigl_tpu.training.hetero_trainer import HeteroNALPTrainer

        g, hdg, paths, model, cfg, *_ = _hetero_setup(num_hard_negs=2)
        cfg = dataclasses.replace(cfg, global_candidate_pool=True)
        mesh = make_mesh(8)
        pg = PartitionedHeteroGraph.build(hdg, paths, mesh,
                                          anchor_node_type="user")
        assert pg.sup_ef is not None and pg.hard_ef is not None
        part = PartitionedHeteroNALPTrainer(
            model, pg, paths, cfg, mesh, capacity_factor=8.0,
            overflow_policy="raise")
        repl = HeteroNALPTrainer(model, hdg, paths, cfg)
        B = 16
        sp = part.init_state(jax.random.PRNGKey(0), batch_size=B)
        sr = repl.init_state(jax.random.PRNGKey(0), batch_size=B)
        anchors = (np.arange(3 * B).reshape(3, B)
                   % g.num_nodes["user"]).astype(np.int32)
        sp, lp = part.train_steps(sp, anchors, jax.random.PRNGKey(1))
        sr, lr = repl.train_steps(sr, anchors, jax.random.PRNGKey(1))
        np.testing.assert_allclose(np.asarray(lp), np.asarray(lr),
                                   rtol=1e-3)
        m = part.evaluate(sp.params, [np.arange(B, dtype=np.int32)])
        assert np.isfinite(m["mrr"])
