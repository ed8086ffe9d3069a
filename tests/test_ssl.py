"""SSL task heads, augmentations, multi-task container, SSL trainer
(ref test model: unit/gnn_library task/loss tests, layers/task.py zoo)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gigl_tpu.data.mocking import TOY_GRAPH_NODE_ANCHOR_LP, get_mocked_graph
from gigl_tpu.models.augmentations import (
    augment_view,
    edge_dropout_masks,
    feature_dropout,
)
from gigl_tpu.models.encoders import GNNEncoder
from gigl_tpu.models.ssl_tasks import (
    BGRLTask,
    DirectAUTask,
    FeatureReconstructionTask,
    GBTTask,
    GraceTask,
    MultiTaskSSL,
    WeightedTask,
    WhiteningDecorrelationTask,
    ema_update,
)
from gigl_tpu.training.dataset import DeviceGraph
from gigl_tpu.training.ssl_trainer import (
    SSL_TASKS,
    SSLTrainer,
    SSLTrainerConfig,
)


class TestAugmentations:
    def test_feature_dropout_zeroes_dims(self):
        x = jnp.ones((10, 32))
        out = feature_dropout(jax.random.PRNGKey(0), x, 0.5)
        col_zero = (np.asarray(out) == 0).all(axis=0)
        assert 0 < col_zero.sum() < 32
        # Same dims dropped for every row (feature masking semantics).
        assert ((np.asarray(out) == 0).all(axis=0)
                | (np.asarray(out) != 0).all(axis=0)).all()

    def test_edge_dropout_only_reduces(self):
        masks = [jnp.ones((8,), bool), jnp.ones((8, 5), bool)]
        out = edge_dropout_masks(jax.random.PRNGKey(1), masks, 0.5)
        assert np.asarray(out[0]).all()  # roots untouched
        assert np.asarray(out[1]).sum() < 40

    def test_zero_rate_identity(self):
        x = jnp.ones((4, 4))
        m = [jnp.ones((4,), bool)]
        f, ms = augment_view(jax.random.PRNGKey(0), [x], m,
                             feature_drop_rate=0.0, edge_drop_rate=0.0)
        np.testing.assert_array_equal(np.asarray(f[0]), np.asarray(x))


class TestTaskHeads:
    def _z(self, seed=0, n=32, d=16):
        rng = np.random.default_rng(seed)
        return (jnp.asarray(rng.normal(size=(n, d)).astype(np.float32)),
                jnp.asarray(rng.normal(size=(n, d)).astype(np.float32)))

    @pytest.mark.parametrize("mk,nargs", [
        (lambda: GraceTask(hidden_dim=16, out_dim=8), 2),
        (lambda: GBTTask(), 2),
        (lambda: WhiteningDecorrelationTask(hidden_dim=16, out_dim=8), 2),
        (lambda: DirectAUTask(), 2),
    ])
    def test_two_view_heads_finite(self, mk, nargs):
        z1, z2 = self._z()
        head = mk()
        params = head.init(jax.random.PRNGKey(0), z1, z2)
        loss = head.apply(params, z1, z2)
        assert np.isfinite(float(loss))

    def test_grace_identical_views_lower_loss(self):
        z1, z2 = self._z()
        head = GraceTask(hidden_dim=16, out_dim=8)
        params = head.init(jax.random.PRNGKey(0), z1, z2)
        l_same = float(head.apply(params, z1, z1))
        l_diff = float(head.apply(params, z1, z2))
        assert l_same < l_diff

    def test_feature_reconstruction(self):
        z1, _ = self._z()
        x = jnp.asarray(np.random.default_rng(2).normal(
            size=(32, 24)).astype(np.float32))
        head = FeatureReconstructionTask(hidden_dim=16)
        params = head.init(jax.random.PRNGKey(0), z1, x)
        assert np.isfinite(float(head.apply(params, z1, x)))

    def test_bgrl_head_and_ema(self):
        z1, z2 = self._z()
        head = BGRLTask(hidden_dim=16)
        params = head.init(jax.random.PRNGKey(0), z1, z2, z1, z2)
        loss = head.apply(params, z1, z2, z1, z2)
        assert np.isfinite(float(loss))
        # EMA: decay 1 -> unchanged, decay 0 -> online copy.
        t = {"w": jnp.zeros(3)}
        o = {"w": jnp.ones(3)}
        np.testing.assert_allclose(
            np.asarray(ema_update(t, o, 1.0)["w"]), 0.0)
        np.testing.assert_allclose(
            np.asarray(ema_update(t, o, 0.0)["w"]), 1.0)

    def test_multitask_container(self):
        z1, z2 = self._z()
        mt = MultiTaskSSL([
            WeightedTask("grace", GraceTask(hidden_dim=16, out_dim=8), 1.0,
                         ("z1", "z2")),
            WeightedTask("gbt", GBTTask(), 0.5, ("z1", "z2")),
        ])
        params = mt.init(jax.random.PRNGKey(0), z1=z1, z2=z2)
        total, per = mt.loss(params, z1=z1, z2=z2)
        assert set(per) == {"grace", "gbt"}
        np.testing.assert_allclose(
            float(total), float(per["grace"]) + 0.5 * float(per["gbt"]),
            rtol=1e-6)

    def test_multitask_duplicate_names_rejected(self):
        with pytest.raises(ValueError, match="duplicate"):
            MultiTaskSSL([WeightedTask("a", GBTTask()),
                          WeightedTask("a", GBTTask())])


class TestSSLTrainer:
    def _graph(self):
        g = get_mocked_graph(TOY_GRAPH_NODE_ANCHOR_LP)
        coo = g.default_edges
        return DeviceGraph.from_hetero(g, supervision_edges=np.asarray(coo))

    @pytest.mark.slow
    @pytest.mark.parametrize("task", list(SSL_TASKS))
    def test_each_task_trains(self, task):
        dg = self._graph()
        enc = GNNEncoder(hid_dim=16, out_dim=16, num_layers=2,
                         conv="graphsage")
        trainer = SSLTrainer(
            enc, dg, SSLTrainerConfig(task=task, fanouts=(4, 3)),
            optimizer_args={"learning_rate": "0.01"})
        state = trainer.init_state(jax.random.PRNGKey(0), batch_size=16)
        rng = jax.random.PRNGKey(1)
        losses = []
        for i in range(6):
            rng, srng = jax.random.split(rng)
            state, loss = trainer.train_step(state, np.arange(16), srng)
            losses.append(float(loss))
        assert all(np.isfinite(l) for l in losses), (task, losses)

    @pytest.mark.slow
    def test_bgrl_target_tracks_online(self):
        dg = self._graph()
        enc = GNNEncoder(hid_dim=16, out_dim=16, num_layers=2,
                         conv="graphsage")
        trainer = SSLTrainer(
            enc, dg, SSLTrainerConfig(task="bgrl", fanouts=(4, 3),
                                      ema_decay=0.5),
            optimizer_args={"learning_rate": "0.05"})
        state = trainer.init_state(jax.random.PRNGKey(0), batch_size=16)
        t0 = jax.tree_util.tree_leaves(state.target_params)[0].copy()
        rng = jax.random.PRNGKey(1)
        for _ in range(3):
            rng, srng = jax.random.split(rng)
            state, _ = trainer.train_step(state, np.arange(16), srng)
        t1 = jax.tree_util.tree_leaves(state.target_params)[0]
        assert not np.allclose(np.asarray(t0), np.asarray(t1))

    @pytest.mark.slow
    def test_grace_loss_decreases_with_fit(self):
        dg = self._graph()
        enc = GNNEncoder(hid_dim=16, out_dim=16, num_layers=2,
                         conv="graphsage")
        trainer = SSLTrainer(
            enc, dg, SSLTrainerConfig(task="grace", fanouts=(4, 3)),
            optimizer_args={"learning_rate": "0.01"})
        state = trainer.init_state(jax.random.PRNGKey(0), batch_size=32)
        rng = jax.random.PRNGKey(2)
        state, first = trainer.train_step(state, np.arange(32), rng)
        state, _ = trainer.fit(state, np.arange(128), batch_size=32,
                               num_epochs=4)
        _, last = trainer.train_step(state, np.arange(32), rng)
        assert float(last) < float(first)

    def test_encode_batch(self):
        dg = self._graph()
        enc = GNNEncoder(hid_dim=16, out_dim=8, num_layers=2,
                         conv="graphsage")
        trainer = SSLTrainer(enc, dg, SSLTrainerConfig(fanouts=(4, 3)))
        state = trainer.init_state(jax.random.PRNGKey(0), batch_size=8)
        z = trainer.encode_batch(state.params, np.arange(8))
        assert z.shape == (8, 8)
