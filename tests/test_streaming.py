"""Out-of-core streamed training tests (training/streaming.py).

Core claim under test: StreamingNALPTrainer (host-resident features, per
batch host gather -> jit step) computes the SAME losses as the
device-resident NALPTrainer in tabularized mode for the same seeds.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gigl_tpu.graph.csr import HeteroGraph
from gigl_tpu.models.encoders import GNNEncoder
from gigl_tpu.models.link_prediction import (
    LinkPredictionDecoder,
    LinkPredictionGNN,
)
from gigl_tpu.sampling.neighbor_sampler import (
    counter_rng_uniform,
    sample_neighbors,
)
from gigl_tpu.training.dataset import DeviceGraph
from gigl_tpu.training.streaming import (
    GroupArrays,
    HostGraphStore,
    StreamingNALPTrainer,
    np_counter_rng_uniform,
    np_sample_fanout,
)
from gigl_tpu.training.trainer import NALPTrainer, NALPTrainerConfig


def _graph_arrays(n=600, e=6000, d=12, seed=0):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    feats = rng.normal(size=(n, d)).astype(np.float32)
    return src, dst, feats, n


class TestNumpyRngMirrors:
    def test_counter_rng_bitwise_parity(self):
        ids = np.arange(257, dtype=np.int32)
        dev = np.asarray(counter_rng_uniform(
            jnp.asarray(ids), seed=42, hop=7, num_slots=5))
        host = np_counter_rng_uniform(ids, seed=42, hop=7, num_slots=5)
        np.testing.assert_array_equal(dev, host)

    def test_np_sample_fanout_bitwise_parity(self):
        src, dst, feats, n = _graph_arrays()
        g = HeteroGraph.homogeneous(src=src, dst=dst, num_nodes=n,
                                    node_features=feats)
        dg = DeviceGraph.from_hetero(g)
        roots = np.arange(n, dtype=np.int32)
        dev_nbr, dev_mask, _ = sample_neighbors(
            dg.message_csr, jnp.asarray(roots), 6, seed=11, hop=3)
        indptr = np.asarray(dg.message_csr.indptr, np.int64)
        indices = np.asarray(dg.message_csr.indices, np.int32)
        nbr, mask = np_sample_fanout(indptr, indices, roots, 6,
                                     seed=11, hop=3)
        np.testing.assert_array_equal(np.asarray(dev_nbr), nbr)
        np.testing.assert_array_equal(np.asarray(dev_mask), mask)


def _build_pair(loss_type="retrieval", fanouts=(5, 4), d=12):
    """Device-resident (tabularized) and streamed trainers sharing params."""
    src, dst, feats, n = _graph_arrays(d=d)
    edges = np.stack([src, dst])
    g = HeteroGraph.homogeneous(src=src, dst=dst, num_nodes=n,
                                node_features=feats)
    dg = DeviceGraph.from_hetero(g, supervision_edges=edges)
    enc = GNNEncoder(hid_dim=16, out_dim=8, num_layers=len(fanouts),
                     conv="graphsage")
    model = LinkPredictionGNN(encoder=enc, decoder=LinkPredictionDecoder())
    cfg = NALPTrainerConfig(fanouts=fanouts, num_random_negs=64,
                            loss_type=loss_type, cached_hop=True)
    dev = NALPTrainer(model, dg, cfg, optimizer_args={"learning_rate": "1e-2"})
    store = HostGraphStore.build(
        message_edges=edges, supervision_edges=edges, features=feats,
        num_nodes=n, fanouts=fanouts, seed=cfg.seed)
    stream = StreamingNALPTrainer(model, store, cfg,
                                  optimizer_args={"learning_rate": "1e-2"})
    return dev, stream, n


class TestStreamedParity:
    @pytest.mark.parametrize("loss_type", ["retrieval", "margin"])
    def test_losses_match_device_resident(self, loss_type):
        dev, stream, n = _build_pair(loss_type)
        B, K = 16, 6
        st_s = stream.init_state(jax.random.PRNGKey(0), batch_size=B)
        st_d = dev.init_state(jax.random.PRNGKey(0), batch_size=B,
                              params=jax.tree_util.tree_map(
                                  jnp.copy, st_s.params))
        anchors = (np.arange(B * K).reshape(K, B) % n).astype(np.int32)
        rng = jax.random.PRNGKey(7)
        _, dev_losses = dev.train_steps(st_d, anchors, rng)
        _, stream_losses = stream.run_steps(st_s, anchors, rng)
        np.testing.assert_allclose(np.asarray(dev_losses), stream_losses,
                                   rtol=2e-4, atol=2e-4)

    def test_sample_tables_match_device(self):
        dev, stream, n = _build_pair()
        packed = np.asarray(dev.graph.sample_tables[5])  # -1 = invalid slot
        host_ids, host_mask = stream.store.sample_tables[5]
        np.testing.assert_array_equal(packed >= 0, host_mask)
        np.testing.assert_array_equal(
            np.where(packed >= 0, packed, 0), np.where(host_mask, host_ids, 0))

    def test_hopcache_agg_matches_device(self):
        dev, stream, n = _build_pair()
        np.testing.assert_allclose(np.asarray(dev.graph.nbr_cache),
                                   stream.store.agg._np,
                                   rtol=1e-5, atol=1e-5)

    def test_eval_and_mmap_features(self, tmp_path):
        src, dst, feats, n = _graph_arrays()
        path = tmp_path / "feats.bin"
        feats.tofile(path)
        mm = np.memmap(path, dtype=np.float32, mode="r",
                       shape=feats.shape)
        edges = np.stack([src, dst])
        store = HostGraphStore.build(
            message_edges=edges, supervision_edges=edges, features=mm,
            num_nodes=n, fanouts=(5, 4), seed=0)
        enc = GNNEncoder(hid_dim=16, out_dim=8, num_layers=2,
                         conv="graphsage")
        model = LinkPredictionGNN(encoder=enc,
                                  decoder=LinkPredictionDecoder())
        cfg = NALPTrainerConfig(fanouts=(5, 4), num_random_negs=64,
                                cached_hop=True)
        tr = StreamingNALPTrainer(model, store, cfg)
        st = tr.init_state(jax.random.PRNGKey(0), batch_size=16)
        anchors = (np.arange(16 * 8).reshape(8, 16) % n).astype(np.int32)
        st, losses = tr.run_steps(st, anchors, jax.random.PRNGKey(1))
        assert np.isfinite(losses).all()
        metrics = tr.evaluate(st.params, anchors[:2])
        assert 0.0 <= metrics["mrr"] <= 1.0

    def test_bf16_streaming_close_to_fp32(self):
        dev, stream, n = _build_pair()
        stream_bf = StreamingNALPTrainer(
            stream.model, stream.store, stream.cfg,
            optimizer_args={"learning_rate": "1e-2"},
            stream_dtype="bfloat16")
        B, K = 16, 4
        st = stream.init_state(jax.random.PRNGKey(0), batch_size=B)
        st_bf = stream_bf.init_state(jax.random.PRNGKey(0), batch_size=B)
        st_bf = st_bf._replace(params=jax.tree_util.tree_map(
            jnp.copy, st.params))
        anchors = (np.arange(B * K).reshape(K, B) % n).astype(np.int32)
        _, l32 = stream.run_steps(st, anchors, jax.random.PRNGKey(1))
        _, lbf = stream_bf.run_steps(st_bf, anchors, jax.random.PRNGKey(1))
        np.testing.assert_allclose(l32, lbf, rtol=0.05, atol=0.05)

    @pytest.mark.slow
    def test_mesh_streaming_matches_single_chip(self):
        """Streamed training over an 8-device data-parallel mesh (batch
        arrays sharded on the root dim, params replicated, XLA-inserted
        candidate all-gather + grad all-reduce) computes EXACTLY the
        single-chip streamed losses — the MAG240M host-features x
        multi-chip recipe (VERDICT r2 item 3)."""
        from gigl_tpu.parallel.mesh import make_mesh

        dev, stream, n = _build_pair()
        mesh = make_mesh(8, axes=("data",))
        stream_dp = StreamingNALPTrainer(
            stream.model, stream.store, stream.cfg,
            optimizer_args={"learning_rate": "1e-2"}, mesh=mesh)
        B, K = 16, 5
        st = stream.init_state(jax.random.PRNGKey(0), batch_size=B)
        st_dp = stream_dp.init_state(jax.random.PRNGKey(0), batch_size=B)
        st_dp = st_dp._replace(params=jax.tree_util.tree_map(
            lambda x: jax.device_put(np.asarray(x), stream_dp._repl_sh),
            st.params))
        anchors = (np.arange(B * K).reshape(K, B) % n).astype(np.int32)
        _, l1 = stream.run_steps(st, anchors, jax.random.PRNGKey(1))
        _, l8 = stream_dp.run_steps(st_dp, anchors, jax.random.PRNGKey(1))
        np.testing.assert_allclose(l1, l8, rtol=2e-4, atol=2e-4)

    def test_mesh_rejects_bad_neg_count(self):
        from gigl_tpu.parallel.mesh import make_mesh

        dev, stream, n = _build_pair()
        cfg = NALPTrainerConfig(fanouts=(5, 4), num_random_negs=63,
                                cached_hop=True)
        with pytest.raises(ValueError, match="divide the mesh"):
            StreamingNALPTrainer(stream.model, stream.store, cfg,
                                 mesh=make_mesh(8, axes=("data",)))

    def test_hard_negatives_stream_with_device_parity(self):
        """Streamed hard negatives: same losses as the device-resident
        trainer with a hard-neg CSR (device-parity draws, hop 2_000_003)."""
        src, dst, feats, n = _graph_arrays(d=12)
        edges = np.stack([src, dst])
        hn_rng = np.random.default_rng(9)
        hard_edges = np.stack([hn_rng.integers(0, n, 3000),
                               hn_rng.integers(0, n, 3000)])
        g = HeteroGraph.homogeneous(src=src, dst=dst, num_nodes=n,
                                    node_features=feats)
        dg = DeviceGraph.from_hetero(g, supervision_edges=edges,
                                     hard_neg_edges=hard_edges)
        enc = GNNEncoder(hid_dim=16, out_dim=8, num_layers=2,
                         conv="graphsage")
        model = LinkPredictionGNN(encoder=enc,
                                  decoder=LinkPredictionDecoder())
        cfg = NALPTrainerConfig(fanouts=(5, 4), num_random_negs=64,
                                num_hard_negs=3, loss_type="retrieval",
                                cached_hop=True)
        dev = NALPTrainer(model, dg, cfg,
                          optimizer_args={"learning_rate": "1e-2"})
        store = HostGraphStore.build(
            message_edges=edges, supervision_edges=edges, features=feats,
            num_nodes=n, fanouts=(5, 4), seed=cfg.seed,
            hard_neg_edges=hard_edges)
        stream = StreamingNALPTrainer(model, store, cfg,
                                      optimizer_args={"learning_rate": "1e-2"})
        B, K = 16, 4
        st_s = stream.init_state(jax.random.PRNGKey(0), batch_size=B)
        st_d = dev.init_state(jax.random.PRNGKey(0), batch_size=B,
                              params=jax.tree_util.tree_map(
                                  jnp.copy, st_s.params))
        anchors = (np.arange(B * K).reshape(K, B) % n).astype(np.int32)
        rng = jax.random.PRNGKey(7)
        _, dev_losses = dev.train_steps(st_d, anchors, rng)
        _, stream_losses = stream.run_steps(st_s, anchors, rng)
        np.testing.assert_allclose(np.asarray(dev_losses), stream_losses,
                                   rtol=2e-4, atol=2e-4)

    def test_hard_negatives_rejected(self):
        src, dst, feats, n = _graph_arrays()
        edges = np.stack([src, dst])
        store = HostGraphStore.build(
            message_edges=edges, supervision_edges=edges, features=feats,
            num_nodes=n, fanouts=(5, 4), seed=0)
        enc = GNNEncoder(hid_dim=16, out_dim=8, num_layers=2,
                         conv="graphsage")
        model = LinkPredictionGNN(enc, LinkPredictionDecoder())
        cfg = NALPTrainerConfig(fanouts=(5, 4), num_hard_negs=2,
                                cached_hop=True)
        # No hard_neg_edges in the store -> rejected up front.
        with pytest.raises(ValueError, match="hard_neg_edges"):
            StreamingNALPTrainer(model, store, cfg)


class TestFusedNativeAssembly:
    """Fused native expand_gather (one C++ pass per tree level) matches the
    pure-numpy assembly bit-for-bit."""

    def _numpy_tree(self, stream, roots):
        """Reference numpy assembly (the pre-fusion _tree path)."""
        fanouts = stream.cfg.fanouts[:-1]
        levels = [roots.reshape(-1).astype(np.int32)]
        masks = [np.ones(levels[0].shape, bool)]
        frontier, parent = levels[0], masks[0]
        for k in fanouts:
            ids_t, mask_t = stream.store.sample_tables[int(k)]
            nbr = ids_t[frontier]
            m = mask_t[frontier] & parent[..., None]
            nbr = np.where(m, nbr, 0)
            levels.append(nbr)
            masks.append(m)
            frontier, parent = nbr, m
        return GroupArrays(
            feats=tuple(stream.store.features._np[l] for l in levels),
            cached=tuple(stream.store.agg._np[l] for l in levels),
            masks=tuple(masks),
            degs=tuple(stream.store.degrees[l] for l in levels),
        )

    def test_tree_matches_numpy_assembly(self):
        from gigl_tpu import native

        if not native.available():
            pytest.skip("native toolchain unavailable")
        _, stream, n = _build_pair()
        roots = (np.arange(24) * 7 % n).astype(np.int32)
        got = stream._tree(roots)
        want = self._numpy_tree(stream, roots)
        assert len(got.feats) == len(want.feats)
        for lvl in range(len(want.feats)):
            np.testing.assert_array_equal(got.masks[lvl], want.masks[lvl])
            np.testing.assert_array_equal(got.feats[lvl], want.feats[lvl])
            np.testing.assert_array_equal(got.cached[lvl], want.cached[lvl])
            np.testing.assert_array_equal(got.degs[lvl], want.degs[lvl])

    def test_expand_gather_out_of_range_raises(self):
        from gigl_tpu import native

        if not native.available():
            pytest.skip("native toolchain unavailable")
        feats = np.zeros((4, 3), np.float32)
        with pytest.raises(ValueError, match="out of range"):
            native.expand_gather(np.array([9], np.int32), None, None, None,
                                 feats, feats, np.zeros(4, np.float32))


class TestStreamedLabelEdgeFeatures:
    def test_losses_match_device_resident_with_edge_scorer(self):
        """Streamed label-edge hydration (host CSR slot lookup) + edge
        scorer == the device-resident trainer's losses exactly."""
        from gigl_tpu.models.link_prediction import EdgeFeatureScorer

        src, dst, feats, n = _graph_arrays()
        edges = np.stack([src, dst])
        rng = np.random.default_rng(4)
        sup_ef = rng.normal(size=(edges.shape[1], 3)).astype(np.float32)
        g = HeteroGraph.homogeneous(src=src, dst=dst, num_nodes=n,
                                    node_features=feats)
        dg = DeviceGraph.from_hetero(g, supervision_edges=edges,
                                     supervision_edge_features=sup_ef)
        enc = GNNEncoder(hid_dim=16, out_dim=8, num_layers=2,
                         conv="graphsage")
        model = LinkPredictionGNN(
            encoder=enc, decoder=LinkPredictionDecoder(),
            edge_scorer=EdgeFeatureScorer(hidden_dim=8))
        cfg = NALPTrainerConfig(fanouts=(5, 4), num_random_negs=64,
                                loss_type="retrieval", cached_hop=True)
        dev = NALPTrainer(model, dg, cfg,
                          optimizer_args={"learning_rate": "1e-2"})
        store = HostGraphStore.build(
            message_edges=edges, supervision_edges=edges, features=feats,
            num_nodes=n, fanouts=(5, 4), seed=cfg.seed,
            supervision_edge_features=sup_ef)
        stream = StreamingNALPTrainer(model, store, cfg,
                                      optimizer_args={"learning_rate":
                                                      "1e-2"})
        B, K = 16, 4
        st_s = stream.init_state(jax.random.PRNGKey(0), batch_size=B)
        st_d = dev.init_state(jax.random.PRNGKey(0), batch_size=B,
                              params=jax.tree_util.tree_map(
                                  jnp.copy, st_s.params))
        anchors = (np.arange(B * K).reshape(K, B) % n).astype(np.int32)
        _, dev_losses = dev.train_steps(st_d, anchors, jax.random.PRNGKey(7))
        _, stream_losses = stream.run_steps(st_s, anchors,
                                            jax.random.PRNGKey(7))
        np.testing.assert_allclose(np.asarray(dev_losses), stream_losses,
                                   rtol=2e-4, atol=2e-4)
