"""Model tests: conv numerics, block-vs-COO path consistency, encoder
stacking, decoders (ref test model: unit/gnn_library tests)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gigl_tpu.models.convs import (
    GATConv,
    GCNConv,
    GINConv,
    GINEConv,
    SAGEConv,
    TransformerConv,
)
from gigl_tpu.models.encoders import GNNEncoder, encoder_from_config
from gigl_tpu.models.layers import (
    DCNCross,
    FeatureEmbeddingLayer,
    JumpingKnowledge,
    l2_normalize,
)
from gigl_tpu.models.link_prediction import (
    DecoderType,
    LinkPredictionDecoder,
    LinkPredictionGNN,
)

KEY = jax.random.PRNGKey(0)


def _full_neighborhood_inputs(num_nodes=6, dim=4, seed=0):
    """A tiny graph + its dense-block representation with FULL neighborhoods,
    so block and coo paths must agree exactly."""
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(num_nodes, dim)).astype(np.float32)
    src = np.array([1, 2, 3, 0, 4, 5, 1, 2])
    dst = np.array([0, 0, 0, 1, 1, 2, 3, 4])
    K = 3  # max in-degree
    nbr_idx = np.zeros((num_nodes, K), np.int32)
    mask = np.zeros((num_nodes, K), bool)
    for v in range(num_nodes):
        nbrs = src[dst == v]
        nbr_idx[v, : len(nbrs)] = nbrs
        mask[v, : len(nbrs)] = True
    nbr_feats = x[nbr_idx]
    return (jnp.array(x), jnp.array(src), jnp.array(dst),
            jnp.array(nbr_feats), jnp.array(mask), num_nodes)


CONVS = [
    ("sage_mean", lambda: SAGEConv(out_dim=8)),
    ("sage_max", lambda: SAGEConv(out_dim=8, aggr="max")),
    ("gcn", lambda: GCNConv(out_dim=8)),
    ("gin", lambda: GINConv(out_dim=8)),
    ("gat", lambda: GATConv(out_dim=8, heads=2)),
    ("gatv2", lambda: GATConv(out_dim=8, heads=2, v2=True)),
    ("transformer", lambda: TransformerConv(out_dim=8, heads=2)),
]


class TestBlockCooConsistency:
    @pytest.mark.parametrize("name,make", CONVS)
    def test_block_equals_coo_on_full_neighborhood(self, name, make):
        x, src, dst, nbr, mask, n = _full_neighborhood_inputs()
        # True degrees for degree-normalized convs: dst in-degree and
        # per-slot neighbor out-degree (matching the coo path's norm).
        in_deg = np.bincount(np.asarray(dst), minlength=n)
        out_deg = np.bincount(np.asarray(src), minlength=n)
        nbr_idx = np.zeros((n, mask.shape[1]), np.int64)
        for v in range(n):
            nbrs = np.asarray(src)[np.asarray(dst) == v]
            nbr_idx[v, : len(nbrs)] = nbrs
        degrees = (jnp.array(in_deg.astype(np.float32)),
                   jnp.array(out_deg[nbr_idx].astype(np.float32)))
        conv = make()
        params = conv.init(KEY, x, nbr, mask)
        out_block = conv.apply(params, x, nbr, mask, None, degrees)
        out_coo = conv.apply(params, x, src, dst, n, method="coo")
        np.testing.assert_allclose(
            np.asarray(out_block), np.asarray(out_coo), rtol=2e-4, atol=2e-5)

    def test_edge_attr_convs_consistency(self):
        x, src, dst, nbr, mask, n = _full_neighborhood_inputs()
        rng = np.random.default_rng(1)
        E = src.shape[0]
        ea_coo = rng.normal(size=(E, 4)).astype(np.float32)
        # Build per-slot edge attrs matching block layout.
        ea_block = np.zeros((n, 3, 4), np.float32)
        srcs = np.asarray(src); dsts = np.asarray(dst)
        slot = {v: 0 for v in range(n)}
        for e in range(E):
            v = dsts[e]
            ea_block[v, slot[v]] = ea_coo[e]
            slot[v] += 1
        for make in (lambda: GINEConv(out_dim=8),
                     lambda: GATConv(out_dim=8, heads=2, use_edge_attr=True),
                     lambda: TransformerConv(out_dim=8, use_edge_attr=True)):
            conv = make()
            params = conv.init(KEY, x, nbr, mask, jnp.array(ea_block))
            out_b = conv.apply(params, x, nbr, mask, jnp.array(ea_block))
            out_c = conv.apply(params, x, src, dst, n, jnp.array(ea_coo),
                               method="coo")
            np.testing.assert_allclose(np.asarray(out_b), np.asarray(out_c),
                                       rtol=2e-4, atol=2e-5)


class TestConvNumerics:
    def test_sage_mean_hand_computed(self):
        # 2 nodes; node0 has neighbor node1 only.
        x = jnp.array([[1.0, 0.0], [0.0, 2.0]])
        nbr = x[jnp.array([[1], [0]])]
        mask = jnp.array([[True], [False]])
        conv = SAGEConv(out_dim=2, use_bias=False)
        params = conv.init(KEY, x, nbr, mask)
        W_self = params["params"]["lin_self"]["kernel"]
        W_nbr = params["params"]["lin_nbr"]["kernel"]
        out = conv.apply(params, x, nbr, mask)
        expect0 = x[0] @ W_self + x[1] @ W_nbr
        expect1 = x[1] @ W_self  # no valid neighbors -> zero agg
        np.testing.assert_allclose(np.asarray(out[0]), np.asarray(expect0), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(out[1]), np.asarray(expect1), rtol=1e-5)

    def test_gat_attention_sums_to_one(self):
        x, src, dst, nbr, mask, n = _full_neighborhood_inputs()
        conv = GATConv(out_dim=8, heads=2)
        params = conv.init(KEY, x, nbr, mask)
        # Uniform features -> attention is uniform -> output = mean of
        # projected neighbors + bias.
        xu = jnp.ones_like(x)
        nbru = jnp.ones_like(nbr)
        out = conv.apply(params, xu, nbru, mask)
        assert bool(jnp.isfinite(out).all())

    def test_gin_eps_zero_init(self):
        x, src, dst, nbr, mask, n = _full_neighborhood_inputs()
        conv = GINConv(out_dim=8)
        params = conv.init(KEY, x, nbr, mask)
        assert float(params["params"]["eps"]) == 0.0


class TestEncoder:
    def _blocks(self, B=4, K1=3, K2=2, D=5, seed=0):
        rng = np.random.default_rng(seed)
        feats = [
            jnp.array(rng.normal(size=(B, D)).astype(np.float32)),
            jnp.array(rng.normal(size=(B, K1, D)).astype(np.float32)),
            jnp.array(rng.normal(size=(B, K1, K2, D)).astype(np.float32)),
        ]
        masks = [
            jnp.ones((B,), bool),
            jnp.array(rng.random((B, K1)) > 0.2),
            jnp.array(rng.random((B, K1, K2)) > 0.2),
        ]
        return feats, masks

    @pytest.mark.parametrize("conv", ["graphsage", "gcn", "gin", "gat",
                                      "gatv2", "transformer"])
    def test_two_layer_output_shape(self, conv):
        feats, masks = self._blocks()
        enc = GNNEncoder(hid_dim=16, out_dim=8, num_layers=2, conv=conv)
        params = enc.init(KEY, feats, masks)
        out = enc.apply(params, feats, masks)
        assert out.shape == (4, 8)
        assert bool(jnp.isfinite(out).all())

    def test_wrong_hop_count_raises(self):
        feats, masks = self._blocks()
        enc = GNNEncoder(hid_dim=16, out_dim=8, num_layers=3)
        with pytest.raises(ValueError, match="hop levels"):
            enc.init(KEY, feats, masks)

    def test_jk_cat_and_linear(self):
        feats, masks = self._blocks()
        enc = GNNEncoder(hid_dim=16, out_dim=8, num_layers=2,
                         jk_mode="cat", linear_layer=True)
        params = enc.init(KEY, feats, masks)
        out = enc.apply(params, feats, masks)
        assert out.shape == (4, 8)

    def test_l2_normalized_output(self):
        feats, masks = self._blocks()
        enc = GNNEncoder(hid_dim=16, out_dim=8, num_layers=2,
                         l2_normalize_output=True)
        params = enc.init(KEY, feats, masks)
        out = enc.apply(params, feats, masks)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(out), axis=-1), 1.0, rtol=1e-5)

    def test_encode_coo_matches_block_full_neighborhood(self):
        """Full 1-layer neighborhood: encoder block path == coo path."""
        x, src, dst, nbr, mask, n = _full_neighborhood_inputs()
        enc = GNNEncoder(hid_dim=8, out_dim=8, num_layers=1, conv="graphsage")
        feats = [x, jnp.array(np.asarray(x)[np.asarray(
            jnp.zeros((n, 3), jnp.int32))])]
        # build proper hop feats from the block inputs
        feats = [x, nbr]
        masks = [jnp.ones((n,), bool), mask]
        params = enc.init(KEY, feats, masks)
        out_block = enc.apply(params, feats, masks)
        out_coo = enc.apply(params, x, src, dst, n, method="encode_coo")
        np.testing.assert_allclose(np.asarray(out_block), np.asarray(out_coo),
                                   rtol=2e-4, atol=2e-5)

    def test_dropout_train_vs_eval(self):
        feats, masks = self._blocks()
        enc = GNNEncoder(hid_dim=16, out_dim=8, num_layers=2, dropout=0.5)
        params = enc.init(KEY, feats, masks)
        out_eval = enc.apply(params, feats, masks, train=False)
        out_eval2 = enc.apply(params, feats, masks, train=False)
        np.testing.assert_array_equal(np.asarray(out_eval), np.asarray(out_eval2))
        out_train = enc.apply(params, feats, masks, train=True,
                              rngs={"dropout": jax.random.PRNGKey(1)})
        assert not np.allclose(np.asarray(out_eval), np.asarray(out_train))

    def test_encoder_from_config(self):
        enc = encoder_from_config(
            {"hid_dim": "32", "out_dim": "16", "num_layers": "2",
             "conv": "gat", "num_heads": "4"})
        assert enc.hid_dim == 32 and enc.conv == "gat"
        assert enc.conv_kwargs["heads"] == 4


class TestAuxLayers:
    def test_feature_embedding(self):
        layer = FeatureEmbeddingLayer(vocab_specs=((1, (10, 3)),))
        x = jnp.array([[0.5, 2.0], [1.5, 7.0]])
        params = layer.init(KEY, x)
        out = layer.apply(params, x)
        assert out.shape == (2, 1 + 3)

    def test_dcn_cross(self):
        x = jnp.array(np.random.default_rng(0).normal(size=(4, 6)).astype(np.float32))
        layer = DCNCross(num_layers=2)
        params = layer.init(KEY, x)
        out = layer.apply(params, x)
        assert out.shape == x.shape

    @pytest.mark.parametrize("mode", [
        "cat", "max",
        pytest.param("lstm", marks=pytest.mark.slow),  # lax.scan LSTM: slow compile
    ])
    def test_jumping_knowledge(self, mode):
        xs = [jnp.ones((4, 8)), jnp.full((4, 8), 2.0)]
        jk = JumpingKnowledge(mode=mode, out_dim=5)
        params = jk.init(KEY, xs)
        out = jk.apply(params, xs)
        assert out.shape == (4, 5)


class TestLinkPrediction:
    def test_inner_product_decoder(self):
        dec = LinkPredictionDecoder()
        q = jnp.array([[1.0, 2.0]])
        c = jnp.array([[3.0, 4.0]])
        params = dec.init(KEY, q, c)
        np.testing.assert_allclose(np.asarray(dec.apply(params, q, c)), [11.0])
        ap = dec.apply(params, q, jnp.array([[1.0, 0.0], [0.0, 1.0]]),
                       method="all_pairs")
        np.testing.assert_allclose(np.asarray(ap), [[1.0, 2.0]])

    @pytest.mark.parametrize("dt", [DecoderType.COSINE, DecoderType.MLP,
                                    DecoderType.HADAMARD_MLP])
    def test_other_decoders(self, dt):
        dec = LinkPredictionDecoder(decoder_type=dt)
        q = jnp.array(np.random.default_rng(0).normal(size=(3, 4)).astype(np.float32))
        c = jnp.array(np.random.default_rng(1).normal(size=(3, 4)).astype(np.float32))
        params = dec.init(KEY, q, c)
        out = dec.apply(params, q, c)
        assert out.shape == (3,)

    def test_wrapper_end_to_end(self):
        enc = GNNEncoder(hid_dim=8, out_dim=8, num_layers=1)
        model = LinkPredictionGNN(encoder=enc, decoder=LinkPredictionDecoder())
        x, src, dst, nbr, mask, n = _full_neighborhood_inputs()
        feats = [x, nbr]
        masks = [jnp.ones((n,), bool), mask]
        params = model.init(KEY, feats, masks)
        emb = model.apply(params, feats, masks)
        scores = model.apply(params, emb[:2], emb[2:4], method="decode")
        assert scores.shape == (2,)
