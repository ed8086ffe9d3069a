"""Tests for the tabularized deepest-hop aggregate cache (ops/hopcache.py).

Semantics under test (see module docstring of ops/hopcache.py): the cache
freezes ONE sampled neighborhood per node per refresh — the reference v1
"tabularized" regime (SGSPureSparkV1Task.scala samples once per job) — and
layer 1 consumes the precomputed aggregate via conv.block_cached.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gigl_tpu.graph.csr import HeteroGraph
from gigl_tpu.models.encoders import GNNEncoder, cached_agg_kind
from gigl_tpu.models.link_prediction import (
    LinkPredictionDecoder,
    LinkPredictionGNN,
)
from gigl_tpu.ops.fanout import masked_mean, masked_sum
from gigl_tpu.ops.hopcache import build_neighbor_cache, build_sample_table
from gigl_tpu.sampling.neighbor_sampler import sample_neighbors
from gigl_tpu.training.dataset import DeviceGraph
from gigl_tpu.training.trainer import NALPTrainer, NALPTrainerConfig


def _toy_graph(n=500, e=4000, d=8, seed=0, isolated=(7, 13)):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    keep = ~(np.isin(src, isolated) | np.isin(dst, isolated))
    src, dst = src[keep], dst[keep]
    g = HeteroGraph.homogeneous(
        src=src, dst=dst, num_nodes=n,
        node_features=rng.normal(size=(n, d)).astype(np.float32))
    return DeviceGraph.from_hetero(g, supervision_edges=np.stack([src, dst]))


class TestBuildNeighborCache:
    def test_matches_direct_sample_mean(self):
        dg = _toy_graph()
        cache = build_neighbor_cache(
            dg.message_csr, dg.node_features, fanout=5, seed=3, hop_key=2,
            agg="mean", chunk=128)
        ids = jnp.arange(dg.num_nodes, dtype=jnp.int32)
        nbr, mask, _ = sample_neighbors(
            dg.message_csr, ids, 5, seed=3, hop=2)
        expect = masked_mean(dg.node_features[nbr], mask)
        np.testing.assert_allclose(np.asarray(cache), np.asarray(expect),
                                   rtol=1e-6, atol=1e-6)

    def test_matches_direct_sample_sum_and_gcn(self):
        dg = _toy_graph()
        ids = jnp.arange(dg.num_nodes, dtype=jnp.int32)
        nbr, mask, _ = sample_neighbors(dg.message_csr, ids, 4, seed=0, hop=1)
        cache_sum = build_neighbor_cache(
            dg.message_csr, dg.node_features, fanout=4, agg="sum", chunk=64)
        np.testing.assert_allclose(
            np.asarray(cache_sum),
            np.asarray(masked_sum(dg.node_features[nbr], mask)),
            rtol=1e-6, atol=1e-6)
        cache_gcn = build_neighbor_cache(
            dg.message_csr, dg.node_features, fanout=4, agg="gcn",
            degrees=dg.degrees, chunk=64)
        w = jax.lax.rsqrt(dg.degrees[nbr] + 1.0)
        np.testing.assert_allclose(
            np.asarray(cache_gcn),
            np.asarray(masked_sum(dg.node_features[nbr] * w[..., None], mask)),
            rtol=1e-5, atol=1e-5)

    def test_isolated_nodes_aggregate_to_zero(self):
        dg = _toy_graph()
        cache = build_neighbor_cache(
            dg.message_csr, dg.node_features, fanout=5, agg="mean", chunk=128)
        np.testing.assert_array_equal(np.asarray(cache[7]), 0.0)
        np.testing.assert_array_equal(np.asarray(cache[13]), 0.0)

    def test_refresh_seed_changes_table(self):
        dg = _toy_graph()
        a = dg.with_neighbor_cache(fanout=3, seed=0, hop_key=2).nbr_cache
        b = dg.with_neighbor_cache(fanout=3, seed=9, hop_key=2).nbr_cache
        assert not np.allclose(np.asarray(a), np.asarray(b))

    def test_sample_table_matches_live_draw(self):
        """Table row v == the live sampler's draw for v at (seed, hop=1),
        so tabularized hop sampling reproduces the live hop-1 sample."""
        dg = _toy_graph()
        ids_t, mask_t = build_sample_table(
            dg.message_csr, fanout=6, seed=5, hop_key=1, chunk=128)
        all_ids = jnp.arange(dg.num_nodes, dtype=jnp.int32)
        nbr, mask, _ = sample_neighbors(dg.message_csr, all_ids, 6,
                                        seed=5, hop=1)
        np.testing.assert_array_equal(np.asarray(ids_t), np.asarray(nbr))
        np.testing.assert_array_equal(np.asarray(mask_t), np.asarray(mask))

    def test_tabularized_blocks_match_live_blocks_first_hop(self):
        dg = _toy_graph().with_neighbor_cache(
            fanout=4, seed=0, hop_key=2, table_fanouts=(5,))
        roots = jnp.arange(32, dtype=jnp.int32)
        tab = dg.sample_hop_blocks_tabularized(roots, (5,))
        live = dg.sample_hop_blocks(roots, (5,), seed=0)
        np.testing.assert_array_equal(np.asarray(tab.node_ids[1]),
                                      np.asarray(live.node_ids[1]))
        np.testing.assert_array_equal(np.asarray(tab.masks[1]),
                                      np.asarray(live.masks[1]))

    def test_tabularized_blocks_missing_fanout_rejected(self):
        dg = _toy_graph().with_neighbor_cache(
            fanout=4, seed=0, hop_key=2, table_fanouts=(5,))
        with pytest.raises(ValueError, match="no sample table for fanout"):
            dg.sample_hop_blocks_tabularized(
                jnp.arange(4, dtype=jnp.int32), (7,))

    def test_bad_agg_rejected(self):
        dg = _toy_graph()
        with pytest.raises(ValueError, match="agg"):
            build_neighbor_cache(dg.message_csr, dg.node_features,
                                 fanout=3, agg="attention")


def _trainer(dg, conv, num_layers, cached, fanouts):
    enc = GNNEncoder(hid_dim=16, out_dim=8, num_layers=num_layers, conv=conv)
    model = LinkPredictionGNN(encoder=enc, decoder=LinkPredictionDecoder())
    cfg = NALPTrainerConfig(fanouts=fanouts, num_random_negs=32,
                            loss_type="retrieval", cached_hop=cached)
    return NALPTrainer(model, dg, cfg, optimizer_args={"learning_rate": "1e-2"})


class TestCachedEncode:
    @pytest.mark.parametrize("conv", ["graphsage", "gcn", "gin"])
    def test_one_layer_exact_parity(self, conv):
        """For L=1 the cache hop key (1) and fanout coincide with the live
        sampler's, so live and cached paths are numerically identical."""
        dg = _toy_graph()
        live = _trainer(dg, conv, 1, False, (5,))
        cached = _trainer(dg, conv, 1, True, (5,))
        st = live.init_state(jax.random.PRNGKey(0), batch_size=16)
        nodes = jnp.arange(16, dtype=jnp.int32)
        np.testing.assert_allclose(
            np.asarray(live.encode_batch(st.params, nodes)),
            np.asarray(cached.encode_batch(st.params, nodes)),
            rtol=1e-5, atol=1e-6)

    def test_two_layer_trains_and_is_deterministic(self):
        dg = _toy_graph(n=800, e=12000)
        tr = _trainer(dg, "graphsage", 2, True, (5, 4))
        st = tr.init_state(jax.random.PRNGKey(0), batch_size=32)
        anchors = (np.arange(32 * 20).reshape(20, 32) % 800).astype(np.int32)
        st1, l1 = tr.train_steps(st, anchors, jax.random.PRNGKey(1))
        l1 = np.asarray(l1)
        assert np.isfinite(l1).all()
        assert l1[-1] < l1[0]
        # same seeds -> same losses
        st_b = tr.init_state(jax.random.PRNGKey(0), batch_size=32)
        _, l2 = tr.train_steps(st_b, anchors, jax.random.PRNGKey(1))
        np.testing.assert_allclose(l1, np.asarray(l2), rtol=1e-5)

    def test_attention_conv_rejected(self):
        dg = _toy_graph()
        with pytest.raises(ValueError, match="not hop-cacheable"):
            _trainer(dg, "gat", 2, True, (5, 4))

    def test_encoder_level_count_validation(self):
        enc = GNNEncoder(hid_dim=16, out_dim=8, num_layers=2, conv="graphsage")
        x = jnp.zeros((4, 8))
        params = enc.init(jax.random.PRNGKey(0),
                          [x, jnp.zeros((4, 3, 8)), jnp.zeros((4, 3, 2, 8))],
                          [jnp.ones((4,), bool), jnp.ones((4, 3), bool),
                           jnp.ones((4, 3, 2), bool)])
        with pytest.raises(ValueError, match="cached path needs 2"):
            enc.apply(params, [x], [jnp.ones((4,), bool)],
                      cached_agg=[jnp.zeros((4, 8))])

    def test_cached_agg_kind_dispatch(self):
        assert cached_agg_kind("graphsage") == "mean"
        assert cached_agg_kind("graphsage", {"aggr": "sum"}) == "sum"
        assert cached_agg_kind("gcn") == "gcn"
        assert cached_agg_kind("gin") == "sum"
        with pytest.raises(ValueError):
            cached_agg_kind("transformer")
        with pytest.raises(ValueError):
            cached_agg_kind("graphsage", {"aggr": "max"})


class TestQuantizedTables:
    def test_quantized_features_train_close_to_fp32(self):
        """int8 features/cache (4x HBM capacity) track the fp32 path."""
        from gigl_tpu.graph.csr import HeteroGraph
        from gigl_tpu.ops.quantized import QuantizedTable

        rng = np.random.default_rng(0)
        n, e = 500, 4000
        src = rng.integers(0, n, e)
        dst = rng.integers(0, n, e)
        feats = rng.normal(size=(n, 8)).astype(np.float32)
        g = HeteroGraph.homogeneous(src=src, dst=dst, num_nodes=n,
                                    node_features=feats)
        sup = np.stack([src, dst])
        dg32 = DeviceGraph.from_hetero(g, supervision_edges=sup)
        dg8 = DeviceGraph.from_hetero(g, supervision_edges=sup,
                                      quantize_features=True)
        assert isinstance(dg8.node_features, QuantizedTable)
        cfg = NALPTrainerConfig(fanouts=(5, 4), num_random_negs=32,
                                cached_hop=True, quantize_cache=True)
        enc = GNNEncoder(hid_dim=16, out_dim=8, num_layers=2,
                         conv="graphsage")
        model = LinkPredictionGNN(encoder=enc,
                                  decoder=LinkPredictionDecoder())
        tr32 = NALPTrainer(model, dg32, NALPTrainerConfig(
            fanouts=(5, 4), num_random_negs=32, cached_hop=True))
        tr8 = NALPTrainer(model, dg8, cfg)
        assert isinstance(tr8.graph.nbr_cache, QuantizedTable)
        st = tr32.init_state(jax.random.PRNGKey(0), batch_size=16)
        st8 = tr8.init_state(jax.random.PRNGKey(0), batch_size=16,
                             params=jax.tree_util.tree_map(
                                 jnp.copy, st.params))
        anchors = (np.arange(16 * 5).reshape(5, 16) % n).astype(np.int32)
        _, l32 = tr32.train_steps(st, anchors, jax.random.PRNGKey(1))
        _, l8 = tr8.train_steps(st8, anchors, jax.random.PRNGKey(1))
        np.testing.assert_allclose(np.asarray(l32), np.asarray(l8),
                                   rtol=0.05, atol=0.2)


class TestTrainStepsScan:
    def test_matches_single_steps(self):
        """scan-chunked steps == the same sequence of single train_step
        calls with the same per-step rngs."""
        dg = _toy_graph(n=300, e=3000)
        tr = _trainer(dg, "graphsage", 2, False, (4, 3))
        st0 = tr.init_state(jax.random.PRNGKey(0), batch_size=8)
        anchors = (np.arange(8 * 5).reshape(5, 8) % 300).astype(np.int32)
        rng = jax.random.PRNGKey(7)
        _, scan_losses = tr.train_steps(st0, anchors, rng)
        st = tr.init_state(jax.random.PRNGKey(0), batch_size=8)
        rngs = jax.random.split(rng, 5)
        seq_losses = []
        for a, r in zip(anchors, rngs):
            st, loss = tr.train_step(st, a, r)
            seq_losses.append(float(loss))
        np.testing.assert_allclose(np.asarray(scan_losses), seq_losses,
                                   rtol=1e-5)


class TestFusedCache:
    """fused_cache=True: one row gather hydrates both layer-1 inputs; the
    step math must be bit-identical to the separate-gather path."""

    def _trainer(self, fused):
        dg = _toy_graph()
        enc = GNNEncoder(hid_dim=16, out_dim=8, num_layers=2,
                         conv="graphsage")
        model = LinkPredictionGNN(encoder=enc,
                                  decoder=LinkPredictionDecoder())
        cfg = NALPTrainerConfig(fanouts=(4, 3), num_random_negs=32,
                                loss_type="retrieval", num_positives=1,
                                cached_hop=True, fused_cache=fused)
        return NALPTrainer(model, dg, cfg,
                           optimizer_args={"learning_rate": "1e-2"})

    def test_losses_match_separate_path(self):
        t_sep = self._trainer(False)
        t_fus = self._trainer(True)
        st_sep = t_sep.init_state(jax.random.PRNGKey(0), batch_size=16)
        st_fus = t_fus.init_state(jax.random.PRNGKey(0), batch_size=16)
        anchors = (np.arange(16 * 5).reshape(5, 16) % 400).astype(np.int32)
        rng = jax.random.PRNGKey(1)
        _, l_sep = t_sep.train_steps(st_sep, anchors, rng)
        _, l_fus = t_fus.train_steps(st_fus, anchors, rng)
        np.testing.assert_allclose(np.asarray(l_sep), np.asarray(l_fus),
                                   rtol=1e-6, atol=1e-6)

    def test_fused_rejects_quantized(self):
        dg = _toy_graph()
        with pytest.raises(ValueError, match="unquantized"):
            dg.with_neighbor_cache(fanout=3, agg="mean", quantize=True,
                                   fuse_features=True)

    def test_packed_sample_table_marks_isolated(self):
        dg = _toy_graph().with_neighbor_cache(
            fanout=3, agg="mean", table_fanouts=(4,))
        packed = np.asarray(dg.sample_tables[4])
        assert (packed[7] == -1).all() and (packed[13] == -1).all()
        # non-isolated rows have at least one valid slot
        deg = np.asarray(dg.degrees)
        assert ((packed >= 0).any(axis=1) == (deg > 0)).all()
