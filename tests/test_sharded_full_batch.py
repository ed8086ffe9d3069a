"""Graph-sharded full-batch trainer (training/sharded_full_batch.py) on the
8-device CPU mesh: forward parity with the single-device COO math, and
end-to-end learning on a Cora-like toy graph."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gigl_tpu.ops.segment import coo_spmm
from gigl_tpu.parallel.mesh import make_mesh
from gigl_tpu.training.sharded_full_batch import (
    ShardedFullBatchConfig,
    ShardedFullBatchTrainer,
)


def _toy(n=150, e=1200, d=12, c=5, seed=0):
    rng = np.random.default_rng(seed)
    edges = np.stack([rng.integers(0, n, e), rng.integers(0, n, e)])
    x = rng.normal(size=(n, d)).astype(np.float32)
    labels = rng.integers(0, c, n)
    masks = np.zeros((3, n), bool)
    masks[rng.integers(0, 3, n), np.arange(n)] = True
    return edges, x, labels, masks


def _reference_logits(conv, edges, x, params, n):
    src = jnp.asarray(edges[0])
    dst = jnp.asarray(edges[1])
    h = jnp.asarray(x)
    if conv == "gcn":
        ones = jnp.ones((src.shape[0],), h.dtype)
        deg_in = coo_spmm(src, dst, ones[:, None], n)[:, 0] + 1.0
        deg_out = jax.ops.segment_sum(ones, src, num_segments=n) + 1.0
        w = jax.lax.rsqrt(deg_in[dst]) * jax.lax.rsqrt(deg_out[src])
    for i, layer in enumerate(params):
        if conv == "gcn":
            agg = coo_spmm(src, dst, h, n, edge_weight=w)
            h = (agg + h / deg_in[:, None]) @ layer["w"] + layer["b"]
        else:
            agg = coo_spmm(src, dst, h, n, reduce="mean")
            h = agg @ layer["w_nbr"] + h @ layer["w_self"] + layer["b"]
        if i + 1 < len(params):
            h = jax.nn.relu(h)
    return h


@pytest.mark.parametrize("conv", ["gcn", "graphsage"])
def test_forward_matches_single_device_coo(conv):
    edges, x, labels, masks = _toy()
    n = x.shape[0]
    mesh = make_mesh(8)
    tr = ShardedFullBatchTrainer(
        edges, x, labels, masks[0], masks[1], masks[2], mesh,
        ShardedFullBatchConfig(conv=conv, hid_dim=16, out_dim=5))
    params = tr.init_params(jax.random.PRNGKey(0))
    got = np.asarray(tr.logits(params))
    want = np.asarray(_reference_logits(conv, edges, x, params, n))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_train_step_reduces_loss_and_stays_sharded():
    edges, x, labels, masks = _toy(seed=1)
    mesh = make_mesh(8)
    tr = ShardedFullBatchTrainer(
        edges, x, labels, masks[0], masks[1], masks[2], mesh,
        ShardedFullBatchConfig(conv="gcn", hid_dim=16, out_dim=5,
                               num_epochs=30, eval_every=30))
    state = tr.init_state(jax.random.PRNGKey(0))
    _, first = tr._train_step(state, tr.x, tr.labels, tr.masks["train"])
    state, metrics = tr.fit(state)
    _, last = tr._train_step(state, tr.x, tr.labels, tr.masks["train"])
    assert float(last) < float(first)
    # Node-sharded layout is preserved end-to-end (O(N/P) HBM per chip).
    assert len(tr.x.sharding.device_set) == 8
    assert "accuracy" in metrics and "test_accuracy" in metrics


@pytest.mark.slow
def test_learns_separable_labels():
    # Labels correlated with features: accuracy should beat chance solidly.
    rng = np.random.default_rng(3)
    n, d, c = 200, 8, 4
    labels = rng.integers(0, c, n)
    centers = rng.normal(size=(c, d)) * 3.0
    x = (centers[labels] + rng.normal(size=(n, d))).astype(np.float32)
    # Homophilous edges (mostly within-class).
    src, dst = [], []
    for cls in range(c):
        ids = np.nonzero(labels == cls)[0]
        src.append(rng.choice(ids, 300))
        dst.append(rng.choice(ids, 300))
    edges = np.stack([np.concatenate(src), np.concatenate(dst)])
    masks = np.zeros((3, n), bool)
    which = rng.integers(0, 10, n)
    masks[0] = which < 8
    masks[1] = which == 8
    masks[2] = which == 9
    mesh = make_mesh(8)
    tr = ShardedFullBatchTrainer(
        edges, x, labels, masks[0], masks[1], masks[2], mesh,
        ShardedFullBatchConfig(conv="graphsage", hid_dim=32, out_dim=c,
                               num_epochs=120, eval_every=20),
        optimizer_args={"learning_rate": "0.01"})
    _, metrics = tr.fit()
    assert metrics["test_accuracy"] > 0.6, metrics
