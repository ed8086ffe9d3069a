"""Degree-bucketed ELL full-graph aggregation tests (ops/ell.py).

Claim under test: encode_ell computes the SAME full-neighborhood
aggregation as the scatter-based encode_coo path (which XLA lowers to
scatter-add, measured 20-40x slower on TPU), for every conv family.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gigl_tpu.graph.csr import HeteroGraph, build_csr
from gigl_tpu.models.encoders import GNNEncoder
from gigl_tpu.ops.ell import EllGraph, default_widths
from gigl_tpu.training.full_batch import (
    FullBatchTrainer,
    full_batch_data_from_graph,
)


def _graph(n=400, e=4000, d=12, seed=0, bidirectional=True):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    if bidirectional:
        src, dst = np.concatenate([src, dst]), np.concatenate([dst, src])
    feats = rng.normal(size=(n, d)).astype(np.float32)
    return src, dst, feats, n


class TestEllGraphStructure:
    def test_default_widths(self):
        assert default_widths(1) == (4,)
        assert default_widths(4) == (4,)
        assert default_widths(5) == (4, 8)
        assert default_widths(100) == (4, 8, 16, 32, 64, 128)

    def test_covers_every_edge_once(self):
        src, dst, _, n = _graph()
        csr = build_csr(src, dst, num_anchor_nodes=n, anchor="dst")
        ell = EllGraph.from_csr(csr)
        total = sum(int(np.asarray(m).sum()) for m in ell.mask)
        assert total == len(src)
        # perm/rank are inverse permutations
        perm = np.asarray(ell.perm)
        rank = np.asarray(ell.rank)
        np.testing.assert_array_equal(rank[perm], np.arange(n))

    def test_rejects_too_small_widths(self):
        src, dst, _, n = _graph()
        csr = build_csr(src, dst, num_anchor_nodes=n, anchor="dst")
        with pytest.raises(ValueError, match="max degree"):
            EllGraph.from_csr(csr, widths=(2,))

    def test_isolated_nodes_masked(self):
        src = np.array([1, 2])
        dst = np.array([2, 1])
        csr = build_csr(src, dst, num_anchor_nodes=4, anchor="dst")
        ell = EllGraph.from_csr(csr)
        total = sum(int(np.asarray(m).sum()) for m in ell.mask)
        assert total == 2


class TestEllVsCooParity:
    @pytest.mark.parametrize("conv", [
        "graphsage", "gcn", "gin", "gat", "gatv2", "transformer"])
    @pytest.mark.slow
    def test_encode_matches_coo(self, conv):
        src, dst, feats, n = _graph()
        csr = build_csr(src, dst, num_anchor_nodes=n, anchor="dst")
        ell = EllGraph.from_csr(csr)
        enc = GNNEncoder(hid_dim=16, out_dim=8, num_layers=2, conv=conv)
        x = jnp.asarray(feats)
        s, d_ = jnp.asarray(src, jnp.int32), jnp.asarray(dst, jnp.int32)
        params = enc.init(jax.random.PRNGKey(0), x, s, d_, n,
                          method="encode_coo")
        z_coo = enc.apply(params, x, s, d_, n, method="encode_coo")
        z_ell = enc.apply(params, x, ell, method="encode_ell")
        np.testing.assert_allclose(np.asarray(z_coo), np.asarray(z_ell),
                                   rtol=2e-4, atol=2e-4)

    @pytest.mark.slow
    def test_edge_attr_parity_gine(self):
        # GINE adds projected edge features to neighbor features, so the
        # input dim must equal hid_dim (same constraint on both paths;
        # the reference sizes its forked GINEConv per layer instead).
        src, dst, feats, n = _graph(d=16)
        rng = np.random.default_rng(3)
        ea = jnp.asarray(rng.normal(size=(len(src), 5)).astype(np.float32))
        csr = build_csr(src, dst, num_anchor_nodes=n, anchor="dst")
        ell = EllGraph.from_csr(csr)
        enc = GNNEncoder(hid_dim=16, out_dim=8, num_layers=2, conv="gine",
                         edge_dim=5)
        x = jnp.asarray(feats)
        s, d_ = jnp.asarray(src, jnp.int32), jnp.asarray(dst, jnp.int32)
        params = enc.init(jax.random.PRNGKey(0), x, s, d_, n, ea,
                          method="encode_coo")
        z_coo = enc.apply(params, x, s, d_, n, ea, method="encode_coo")
        z_ell = enc.apply(params, x, ell, ea, method="encode_ell")
        np.testing.assert_allclose(np.asarray(z_coo), np.asarray(z_ell),
                                   rtol=2e-4, atol=2e-4)


class TestEllGradients:
    """The ELL backward runs through the transpose tables (custom VJP,
    scatter-free); gradients must match the autodiff of the COO path."""

    @pytest.mark.parametrize("conv", ["graphsage", "gat"])
    @pytest.mark.slow
    def test_param_grads_match_coo(self, conv):
        src, dst, feats, n = _graph()
        csr = build_csr(src, dst, num_anchor_nodes=n, anchor="dst")
        ell = EllGraph.from_csr(csr)
        enc = GNNEncoder(hid_dim=16, out_dim=8, num_layers=2, conv=conv)
        x = jnp.asarray(feats)
        s, d_ = jnp.asarray(src, jnp.int32), jnp.asarray(dst, jnp.int32)
        params = enc.init(jax.random.PRNGKey(0), x, s, d_, n,
                          method="encode_coo")

        def loss_coo(p):
            return (enc.apply(p, x, s, d_, n, method="encode_coo") ** 2).sum()

        def loss_ell(p):
            return (enc.apply(p, x, ell, method="encode_ell") ** 2).sum()

        g1 = jax.grad(loss_coo)(params)
        g2 = jax.grad(loss_ell)(params)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-3),
            g1, g2)

    @pytest.mark.slow
    def test_edge_attr_grads_match_coo(self):
        src, dst, feats, n = _graph(d=16)
        rng = np.random.default_rng(3)
        ea = jnp.asarray(rng.normal(size=(len(src), 5)).astype(np.float32))
        csr = build_csr(src, dst, num_anchor_nodes=n, anchor="dst")
        ell = EllGraph.from_csr(csr)
        enc = GNNEncoder(hid_dim=16, out_dim=8, num_layers=2, conv="gine",
                         edge_dim=5)
        x = jnp.asarray(feats)
        s, d_ = jnp.asarray(src, jnp.int32), jnp.asarray(dst, jnp.int32)
        params = enc.init(jax.random.PRNGKey(0), x, s, d_, n, ea,
                          method="encode_coo")
        g1 = jax.grad(lambda e: (enc.apply(
            params, x, s, d_, n, e, method="encode_coo") ** 2).sum())(ea)
        g2 = jax.grad(lambda e: (enc.apply(
            params, x, ell, e, method="encode_ell") ** 2).sum())(ea)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                                   rtol=5e-3, atol=5e-3)


class TestFullBatchWithEll:
    def test_trainer_uses_ell_and_learns(self):
        from gigl_tpu.data.mocking import get_mocked_graph

        g = get_mocked_graph("cora_node_classification")
        data = full_batch_data_from_graph(g)
        assert data.ell is not None
        nt = g.metadata.node_types[0]
        num_classes = int(np.asarray(g.node_labels[nt]).max()) + 1
        enc = GNNEncoder(hid_dim=32, out_dim=num_classes, num_layers=2,
                         conv="graphsage")
        from gigl_tpu.training.full_batch import FullBatchTrainerConfig

        tr = FullBatchTrainer(enc, data,
                              FullBatchTrainerConfig(num_epochs=40,
                                                     eval_every=10),
                              optimizer_args={"learning_rate": "1e-2"})
        state, metrics = tr.fit()
        assert metrics["accuracy"] > 0.5, metrics

    def test_ell_and_coo_same_loss_curve(self):
        from gigl_tpu.data.mocking import get_mocked_graph

        g = get_mocked_graph("cora_node_classification")
        d_ell = full_batch_data_from_graph(g, build_ell=True)
        d_coo = full_batch_data_from_graph(g, build_ell=False)
        nt = g.metadata.node_types[0]
        num_classes = int(np.asarray(g.node_labels[nt]).max()) + 1
        enc = GNNEncoder(hid_dim=16, out_dim=num_classes, num_layers=2,
                         conv="graphsage")
        t1 = FullBatchTrainer(enc, d_ell,
                              optimizer_args={"learning_rate": "1e-2"})
        t2 = FullBatchTrainer(enc, d_coo,
                              optimizer_args={"learning_rate": "1e-2"})
        s1 = t1.init_state(jax.random.PRNGKey(0))
        s2 = t2.init_state(jax.random.PRNGKey(0),
                           params=jax.tree_util.tree_map(
                               jnp.copy, s1.params))
        rng = jax.random.PRNGKey(1)
        for i in range(3):
            s1, l1 = t1._train_step(t1.data, s1, rng)
            s2, l2 = t2._train_step(t2.data, s2, rng)
            np.testing.assert_allclose(float(l1), float(l2), rtol=1e-4)


class TestFullGraphInference:
    @pytest.mark.slow
    def test_full_graph_inference_exports_all_nodes(self, tmp_path):
        from gigl_tpu.data.export import EmbeddingExporter
        from gigl_tpu.data.mocking import get_mocked_graph
        from gigl_tpu.inference.inferencer import run_full_graph_inference

        g = get_mocked_graph("cora_node_classification")
        nt = g.metadata.node_types[0]
        n = g.num_nodes[nt]
        enc = GNNEncoder(hid_dim=16, out_dim=8, num_layers=2,
                         conv="graphsage")
        x = jnp.asarray(np.asarray(g.node_features[nt]), jnp.float32)
        et = g.metadata.edge_types[0]
        from gigl_tpu.ops.ell import EllGraph as _EG
        ell = _EG.from_csr(g.csr(et, anchor="dst"))
        params = enc.init(jax.random.PRNGKey(0), x, ell,
                          method="encode_ell")
        exporter = EmbeddingExporter(str(tmp_path / "emb"))
        rows = run_full_graph_inference(enc, params, g, exporter)
        assert rows == n
        from gigl_tpu.data.export import read_embedding_shards
        shards = list(read_embedding_shards(str(tmp_path / "emb")))
        ids = np.concatenate([s[0] for s in shards])
        embs = np.concatenate([s[1] for s in shards])
        assert len(ids) == n
        assert embs.shape == (n, 8)
        # Embedding of node v equals the ELL encode row v.
        z = enc.apply(params, x, ell, method="encode_ell")
        order = np.argsort(ids)
        np.testing.assert_allclose(embs[order], np.asarray(z),
                                   rtol=1e-5, atol=1e-6)
