"""End-to-end training tests on planted-structure toy graphs (ref test model:
SURVEY.md §4 — tiny deterministic graphs with verifiable learning outcomes)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gigl_tpu.graph.csr import HeteroGraph
from gigl_tpu.graph.splitters import HashedNodeAnchorLinkSplitter
from gigl_tpu.models.encoders import GNNEncoder
from gigl_tpu.models.link_prediction import (
    LinkPredictionDecoder,
    LinkPredictionGNN,
)
from gigl_tpu.training.dataset import AnchorBatchIterator, DeviceGraph
from gigl_tpu.training.early_stop import EarlyStopper
from gigl_tpu.training.trainer import (
    NALPTrainer,
    NALPTrainerConfig,
    NodeClassificationTrainer,
    NodeClassificationTrainerConfig,
)


def _clustered_graph(num_clusters=32, nodes_per_cluster=4, intra_edges=30,
                     dim=8, seed=0):
    """Nodes in the same cluster share feature signal and are linked;
    link prediction within clusters is learnable."""
    rng = np.random.default_rng(seed)
    N = num_clusters * nodes_per_cluster
    cluster = np.arange(N) // nodes_per_cluster
    centers = rng.normal(size=(num_clusters, dim)) * 3
    x = (centers[cluster] + rng.normal(size=(N, dim)) * 0.3).astype(np.float32)
    srcs, dsts = [], []
    for c in range(num_clusters):
        members = np.where(cluster == c)[0]
        s = rng.choice(members, intra_edges)
        d = rng.choice(members, intra_edges)
        srcs.append(s)
        dsts.append(d)
    src = np.concatenate(srcs)
    dst = np.concatenate(dsts)
    g = HeteroGraph.homogeneous(src=src, dst=dst, num_nodes=N,
                                node_features=x, node_labels=cluster,
                                make_undirected=True)
    return g, src, dst, cluster


def _nalp_setup(loss_type="retrieval", **cfg_kwargs):
    g, src, dst, _ = _clustered_graph()
    sup = np.stack([src, dst])
    dg = DeviceGraph.from_hetero(g, supervision_edges=sup)
    enc = GNNEncoder(hid_dim=16, out_dim=16, num_layers=2, conv="graphsage")
    model = LinkPredictionGNN(encoder=enc, decoder=LinkPredictionDecoder())
    cfg = NALPTrainerConfig(
        fanouts=(5, 3), num_random_negs=64, loss_type=loss_type,
        eval_ks=(1, 10), **cfg_kwargs)
    trainer = NALPTrainer(model, dg, cfg,
                          optimizer_args={"learning_rate": "0.01"})
    # Anchors: nodes with at least one supervision edge.
    anchors = np.unique(dst)
    return trainer, anchors


class TestNALPTraining:
    @pytest.mark.parametrize("loss_type", ["retrieval", "margin", "softmax"])
    def test_loss_decreases(self, loss_type):
        trainer, anchors = _nalp_setup(loss_type)
        state = trainer.init_state(jax.random.PRNGKey(0), batch_size=32)
        rng = jax.random.PRNGKey(1)
        losses = []
        it = AnchorBatchIterator(anchors, 32, seed=0)
        for epoch in range(6):
            for b in it.epoch(epoch):
                rng, srng = jax.random.split(rng)
                state, loss = trainer.train_step(state, b, srng)
                losses.append(float(loss))
        first = np.mean(losses[:4])
        last = np.mean(losses[-4:])
        assert last < first, (first, last)

    def test_mrr_improves_with_training(self):
        trainer, anchors = _nalp_setup("retrieval")
        state = trainer.init_state(jax.random.PRNGKey(0), batch_size=32)
        val_batches = [anchors[:32], anchors[32:64]]
        before = trainer.evaluate(state.params, val_batches)
        rng = jax.random.PRNGKey(1)
        it = AnchorBatchIterator(anchors, 32, seed=0)
        for epoch in range(8):
            for b in it.epoch(epoch):
                rng, srng = jax.random.split(rng)
                state, _ = trainer.train_step(state, b, srng)
        after = trainer.evaluate(state.params, val_batches)
        assert after["mrr"] > before["mrr"] + 0.1, (before, after)
        assert 0 <= after["hits@10"] <= 1

    @pytest.mark.slow
    def test_fit_loop_with_early_stop(self):
        trainer, anchors = _nalp_setup("retrieval")
        state = trainer.init_state(jax.random.PRNGKey(0), batch_size=32)
        state, metrics = trainer.fit(
            state, anchors, anchors[:64], batch_size=32, num_epochs=2,
            val_every_n_batches=3, num_val_batches=2, early_stop_patience=2,
            log_every=1000)
        assert "mrr" in metrics and metrics["mrr"] > 0

    @pytest.mark.slow
    def test_deterministic_given_seeds(self):
        t1, anchors = _nalp_setup("margin")
        t2, _ = _nalp_setup("margin")
        s1 = t1.init_state(jax.random.PRNGKey(0), batch_size=16)
        s2 = t2.init_state(jax.random.PRNGKey(0), batch_size=16)
        rng = jax.random.PRNGKey(5)
        s1, l1 = t1.train_step(s1, anchors[:16], rng)
        s2, l2 = t2.train_step(s2, anchors[:16], rng)
        assert float(l1) == float(l2)

    def test_cms_correction_path_runs(self):
        trainer, anchors = _nalp_setup("retrieval", use_cms_correction=True)
        state = trainer.init_state(jax.random.PRNGKey(0), batch_size=16)
        state, loss = trainer.train_step(state, anchors[:16],
                                         jax.random.PRNGKey(1))
        assert np.isfinite(float(loss))
        assert int(state.cms.total) > 0

    def test_hard_negatives_path(self):
        g, src, dst, cluster = _clustered_graph()
        rng = np.random.default_rng(3)
        # Hard negatives: cross-cluster edges.
        hn_src = rng.integers(0, len(cluster), 500)
        hn_dst = (hn_src + 32) % len(cluster)
        dg = DeviceGraph.from_hetero(
            g, supervision_edges=np.stack([src, dst]),
            hard_neg_edges=np.stack([hn_dst, hn_src]))
        enc = GNNEncoder(hid_dim=8, out_dim=8, num_layers=1)
        model = LinkPredictionGNN(encoder=enc, decoder=LinkPredictionDecoder())
        trainer = NALPTrainer(
            model, dg,
            NALPTrainerConfig(fanouts=(4,), num_hard_negs=2,
                              num_random_negs=32, loss_type="margin"))
        state = trainer.init_state(jax.random.PRNGKey(0), batch_size=16)
        state, loss = trainer.train_step(state, np.unique(dst)[:16],
                                         jax.random.PRNGKey(1))
        assert np.isfinite(float(loss))


class TestNodeClassification:
    def test_accuracy_beats_chance(self):
        g, _, _, cluster = _clustered_graph(
            num_clusters=4, nodes_per_cluster=32, intra_edges=300)
        dg = DeviceGraph.from_hetero(g)
        enc = GNNEncoder(hid_dim=16, out_dim=4, num_layers=2)
        trainer = NodeClassificationTrainer(
            enc, dg, NodeClassificationTrainerConfig(fanouts=(5, 3)),
            optimizer_args={"learning_rate": "0.01"})
        nodes = np.arange(len(cluster))
        splitter_rng = np.random.default_rng(0)
        perm = splitter_rng.permutation(nodes)
        train_nodes, val_nodes = perm[:96], perm[96:]
        state = trainer.init_state(jax.random.PRNGKey(0), batch_size=32)
        state, metrics = trainer.fit(
            state, train_nodes, val_nodes, batch_size=32, num_epochs=8,
            log_every=1000)
        assert metrics["accuracy"] > 0.6, metrics  # 4 classes, chance 0.25

    def test_missing_labels_raises(self):
        g, src, dst, _ = _clustered_graph()
        g.node_labels.clear()
        dg = DeviceGraph.from_hetero(g)
        enc = GNNEncoder(hid_dim=8, out_dim=4, num_layers=1)
        with pytest.raises(ValueError, match="labels"):
            NodeClassificationTrainer(enc, dg,
                                      NodeClassificationTrainerConfig())


class TestEarlyStopper:
    def test_patience(self):
        s = EarlyStopper(patience=2)
        assert not s.update(0.5, "a")
        assert not s.update(0.4, "b")  # bad 1
        assert s.update(0.3, "c")      # bad 2 -> stop
        assert s.best_value == 0.5 and s.best_state == "a"

    def test_less_is_better(self):
        s = EarlyStopper(patience=1, greater_is_better=False)
        assert not s.update(1.0)
        assert not s.update(0.5)
        assert s.update(0.7)


class TestCheckpoint:
    def test_save_restore_round_trip(self, tmp_path):
        from gigl_tpu.training.checkpoint import restore_params, save_params

        params = {"dense": {"kernel": jnp.ones((3, 4)),
                            "bias": jnp.zeros((4,))}}
        save_params(str(tmp_path / "ckpt"), params, step=7)
        got = restore_params(str(tmp_path / "ckpt"))
        np.testing.assert_array_equal(
            np.asarray(got["dense"]["kernel"]), np.ones((3, 4)))

    def test_restore_latest_of_many(self, tmp_path):
        from gigl_tpu.training.checkpoint import restore_params, save_params

        for step in (1, 5, 3):
            save_params(str(tmp_path / "c"),
                        {"w": jnp.full((2,), float(step))}, step=step)
        got = restore_params(str(tmp_path / "c"))
        np.testing.assert_array_equal(np.asarray(got["w"]), [5.0, 5.0])


class TestTrainStateCheckpoint:
    """Full-state mid-training resume (beyond the reference's end-of-run
    params-only save)."""

    def test_save_restore_resume_exact(self, tmp_path):
        import jax

        from gigl_tpu.training.checkpoint import (
            latest_step,
            restore_train_state,
            save_train_state,
        )

        tr, anchor_pool = _nalp_setup()
        st = tr.init_state(jax.random.PRNGKey(0), batch_size=8)
        anchors = (np.arange(8 * 6).reshape(6, 8) % len(anchor_pool)).astype(np.int32)
        rng = jax.random.PRNGKey(1)
        st, _ = tr.train_steps(st, anchors[:3], rng)
        # jnp.copy: train_steps donates its input state buffers.
        snap = jax.tree_util.tree_map(
            lambda x: jnp.copy(x) if hasattr(x, "dtype") else x, st)
        save_train_state(str(tmp_path / "ck"), snap, step=3)
        assert latest_step(str(tmp_path / "ck")) == 3

        # Continue A: from the live state.
        st_a, losses_a = tr.train_steps(st, anchors[3:], rng)
        # Continue B: from the restored checkpoint.
        template = tr.init_state(jax.random.PRNGKey(0), batch_size=8)
        restored = restore_train_state(str(tmp_path / "ck"), template)
        assert int(restored.step) == 3
        st_b, losses_b = tr.train_steps(restored, anchors[3:], rng)
        np.testing.assert_allclose(np.asarray(losses_a),
                                   np.asarray(losses_b), rtol=1e-6)

    def test_latest_step_empty(self, tmp_path):
        from gigl_tpu.training.checkpoint import latest_step

        assert latest_step(str(tmp_path / "nope")) is None


class TestFitCheckpointResume:
    @pytest.mark.slow
    def test_fit_resumes_from_checkpoint_dir(self, tmp_path):
        """Kill-and-restart: a second fit() with the same checkpoint_dir
        skips the covered chunks and continues from the saved full state."""
        ck = str(tmp_path / "ck")
        tr, anchors = _nalp_setup()
        st = tr.init_state(jax.random.PRNGKey(0), batch_size=16)
        # Uninterrupted run.
        tr2, _ = _nalp_setup()
        st2 = tr2.init_state(jax.random.PRNGKey(0), batch_size=16)
        state_full, m_full = tr2.fit(
            st2, anchors, anchors[:32], batch_size=16, num_epochs=2,
            val_every_n_batches=3, num_val_batches=1,
            early_stop_patience=100)
        # Interrupted: first fit writes checkpoints; simulate preemption by
        # running only epoch 0, then a fresh fit resumes from the dir.
        tr.fit(st, anchors, anchors[:32], batch_size=16, num_epochs=1,
               val_every_n_batches=3, num_val_batches=1,
               early_stop_patience=100, checkpoint_dir=ck)
        from gigl_tpu.training.checkpoint import latest_step
        assert latest_step(ck) is not None
        tr3, _ = _nalp_setup()
        st3 = tr3.init_state(jax.random.PRNGKey(0), batch_size=16)
        state_res, m_res = tr3.fit(
            st3, anchors, anchors[:32], batch_size=16, num_epochs=2,
            val_every_n_batches=3, num_val_batches=1,
            early_stop_patience=100, checkpoint_dir=ck)
        # Both end at the same step count and produce finite metrics.
        assert np.isfinite(m_res["mrr"]) and np.isfinite(m_full["mrr"])
