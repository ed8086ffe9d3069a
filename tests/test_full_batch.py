"""Full-batch COO trainer: Cora-like GCN/SAGE whole-graph training
(BASELINE.md milestone 1 — full-batch node classification, SpMM path)."""

import jax
import numpy as np
import pytest

from gigl_tpu.data.mocking import CORA_NODE_CLASSIFICATION, get_mocked_graph
from gigl_tpu.models.encoders import GNNEncoder
from gigl_tpu.training.full_batch import (
    FullBatchTrainer,
    FullBatchTrainerConfig,
    full_batch_data_from_graph,
)


@pytest.fixture(scope="module")
def cora_data():
    g = get_mocked_graph(CORA_NODE_CLASSIFICATION)
    return full_batch_data_from_graph(g, seed=0)


class TestFullBatchData:
    def test_split_masks_partition_nodes(self, cora_data):
        total = (np.asarray(cora_data.train_mask).sum()
                 + np.asarray(cora_data.val_mask).sum()
                 + np.asarray(cora_data.test_mask).sum())
        assert total == cora_data.num_nodes
        assert not (np.asarray(cora_data.train_mask)
                    & np.asarray(cora_data.val_mask)).any()


class TestFullBatchTrainer:
    @pytest.mark.parametrize("conv", ["gcn", "graphsage"])
    def test_learns_cora_like(self, cora_data, conv):
        enc = GNNEncoder(hid_dim=32, out_dim=7, num_layers=2, conv=conv)
        trainer = FullBatchTrainer(
            enc, cora_data,
            FullBatchTrainerConfig(num_epochs=60, eval_every=10),
            optimizer_args={"learning_rate": "0.01"})
        state, metrics = trainer.fit()
        assert metrics["accuracy"] > 0.6, metrics
        assert metrics["test_accuracy"] > 0.55, metrics

    def test_deterministic_init_and_step(self, cora_data):
        enc = GNNEncoder(hid_dim=16, out_dim=7, num_layers=2, conv="gcn")
        t = FullBatchTrainer(enc, cora_data,
                             optimizer_args={"learning_rate": "0.01"})
        s1 = t.init_state(jax.random.PRNGKey(3))
        s2 = t.init_state(jax.random.PRNGKey(3))
        _, l1 = t._train_step(t.data, s1, jax.random.PRNGKey(4))
        _, l2 = t._train_step(t.data, s2, jax.random.PRNGKey(4))
        assert float(l1) == float(l2)
