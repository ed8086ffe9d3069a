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
