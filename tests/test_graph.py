"""Tests for graph containers and splitters (ref test model: SURVEY.md §4 —
splitter determinism tests, unit/utils splitter tests, scala assigner tests)."""

import numpy as np
import pytest

from gigl_tpu.graph.csr import CSR, HeteroGraph, build_csr
from gigl_tpu.graph.splitters import (
    DatasetSplit,
    EdgeUsage,
    HashedNodeAnchorLinkSplitter,
    TransductiveEdgeSplitter,
    fast_hash,
    select_ssl_positive_edges,
)
from gigl_tpu.types.graph import EdgeType, GraphMetadata


class TestCSR:
    def test_build_csr_dst_anchor(self):
        # edges: 0->1, 0->2, 1->2, 3->2
        src = np.array([0, 0, 1, 3])
        dst = np.array([1, 2, 2, 2])
        csr = build_csr(src, dst, num_anchor_nodes=4, num_neighbor_nodes=4)
        assert csr.num_anchor_nodes == 4
        np.testing.assert_array_equal(csr.degrees(), [0, 1, 3, 0])
        np.testing.assert_array_equal(csr.neighbors(2), [0, 1, 3])
        np.testing.assert_array_equal(csr.neighbors(1), [0])

    def test_build_csr_src_anchor(self):
        src = np.array([0, 0, 1, 3])
        dst = np.array([1, 2, 2, 2])
        csr = build_csr(src, dst, num_anchor_nodes=4, anchor="src")
        np.testing.assert_array_equal(csr.degrees(), [2, 1, 0, 1])
        np.testing.assert_array_equal(csr.neighbors(0), [1, 2])

    def test_edge_ids_map_back_to_coo(self):
        src = np.array([5, 3, 5])
        dst = np.array([1, 1, 0])
        csr = build_csr(src, dst, num_anchor_nodes=2, num_neighbor_nodes=6)
        # anchor 1's neighbors are src {5, 3} in original edge order.
        for slot in range(csr.indptr[1], csr.indptr[2]):
            eid = csr.edge_ids[slot]
            assert dst[eid] == 1
            assert src[eid] == csr.indices[slot]

    def test_anchor_id_out_of_range_raises(self):
        with pytest.raises(ValueError, match="anchor id"):
            build_csr(np.array([0]), np.array([9]), num_anchor_nodes=3)

    def test_deterministic(self):
        rng = np.random.default_rng(0)
        src = rng.integers(0, 100, 1000)
        dst = rng.integers(0, 100, 1000)
        a = build_csr(src, dst, num_anchor_nodes=100)
        b = build_csr(src, dst, num_anchor_nodes=100)
        np.testing.assert_array_equal(a.indices, b.indices)


class TestHeteroGraph:
    def test_homogeneous_undirected(self):
        g = HeteroGraph.homogeneous(
            src=[0, 1], dst=[1, 2], num_nodes=3, make_undirected=True,
            node_features=np.eye(3, dtype=np.float32),
        )
        assert g.default_edges.shape == (2, 4)
        csr = g.csr(g.metadata.edge_types[0], anchor="dst")
        # node 1 has in-edges from 0 (orig) and 2 (reversed).
        assert set(csr.neighbors(1).tolist()) == {0, 2}

    def test_hetero_csr_per_type(self):
        gm = GraphMetadata(
            node_types=("u", "i"),
            edge_types=(EdgeType("u", "buys", "i"),),
        )
        g = HeteroGraph(
            metadata=gm,
            num_nodes={"u": 3, "i": 2},
            edges={EdgeType("u", "buys", "i"): np.array([[0, 1, 2], [0, 0, 1]])},
        )
        csr = g.csr(EdgeType("u", "buys", "i"), anchor="dst")
        assert csr.num_anchor_nodes == 2  # item side
        np.testing.assert_array_equal(csr.neighbors(0), [0, 1])

    def test_bad_edge_shape_raises(self):
        gm = GraphMetadata.homogeneous()
        with pytest.raises(ValueError, match=r"\[2, E\]"):
            HeteroGraph(
                metadata=gm,
                num_nodes={"default": 2},
                edges={gm.edge_types[0]: np.array([0, 1])},
            )


class TestFastHash:
    def test_parity_with_reference_torch_semantics(self):
        """The reference hash (data_splitters.py:53-88) in torch; ours must
        produce bit-identical values so split assignments match."""
        import torch

        x = np.array([0, 1, 2, 12345, 2**40, -7], dtype=np.int64)
        t = torch.tensor(x).clone()
        t.bitwise_xor_(t >> 30)
        t.multiply_(0xBF58476D1CE4E5B9)
        t.bitwise_xor_(t >> 27)
        t.multiply_(0x94D049BB133111EB)
        t.bitwise_xor_(t >> 31)
        ours = fast_hash(x)
        np.testing.assert_array_equal(ours, t.numpy())

    def test_zero_maps_to_zero(self):
        assert fast_hash(np.array([0], dtype=np.int64))[0] == 0
        assert fast_hash(np.array([0], dtype=np.int32))[0] == 0

    def test_int32_path(self):
        x = np.array([1, 2, 3], dtype=np.int32)
        h = fast_hash(x)
        assert h.dtype == np.int32
        assert len(set(h.tolist())) == 3


class TestHashedNodeAnchorLinkSplitter:
    def test_homogeneous_disjoint_and_complete(self):
        rng = np.random.default_rng(1)
        edges = np.stack([rng.integers(0, 500, 2000), rng.integers(0, 500, 2000)])
        train, val, test = HashedNodeAnchorLinkSplitter(
            sampling_direction="in", num_val=0.1, num_test=0.1
        )(edges)
        all_anchor = np.unique(edges[1])
        got = np.concatenate([train, val, test])
        assert len(got) == len(all_anchor)
        assert len(np.intersect1d(train, val)) == 0
        assert len(np.intersect1d(train, test)) == 0
        np.testing.assert_array_equal(np.sort(got), all_anchor)
        # ~80/10/10
        assert abs(len(train) - 0.8 * len(all_anchor)) <= 2

    def test_deterministic(self):
        edges = np.stack([np.arange(100), np.arange(100) % 10])
        s = HashedNodeAnchorLinkSplitter(sampling_direction="out")
        a = s(edges)
        b = s(edges)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(x, y)

    def test_integer_counts(self):
        edges = np.stack([np.arange(50), np.arange(50)])
        train, val, test = HashedNodeAnchorLinkSplitter(
            sampling_direction="in", num_val=5, num_test=7
        )(edges)
        assert (len(train), len(val), len(test)) == (38, 5, 7)

    def test_heterogeneous(self):
        et = EdgeType("u", "buys", "i")
        edges = {et: np.stack([np.arange(30), np.arange(30) % 8])}
        out = HashedNodeAnchorLinkSplitter(
            sampling_direction="in", supervision_edge_types=[et],
            num_val=0.2, num_test=0.2,
        )(edges)
        assert set(out.keys()) == {"i"}
        train, val, test = out["i"]
        assert len(train) + len(val) + len(test) == 8

    def test_no_train_nodes_raises(self):
        edges = np.stack([np.arange(2), np.arange(2)])
        with pytest.raises(ValueError, match="No training nodes"):
            HashedNodeAnchorLinkSplitter(
                sampling_direction="in", num_val=1, num_test=1
            )(edges)

    def test_bad_direction_raises(self):
        with pytest.raises(ValueError, match="direction"):
            HashedNodeAnchorLinkSplitter(sampling_direction="up")


class TestTransductiveEdgeSplitter:
    def test_ratios_and_determinism(self):
        rng = np.random.default_rng(2)
        src = rng.integers(0, 10_000, 100_000)
        dst = rng.integers(0, 10_000, 100_000)
        sp = TransductiveEdgeSplitter(train_ratio=0.7, val_ratio=0.15, seed=9)
        a = sp(src, dst)
        b = sp(src, dst)
        np.testing.assert_array_equal(a.split, b.split)
        frac_train = np.mean(a.split == DatasetSplit.TRAIN)
        assert abs(frac_train - 0.7) < 0.01
        frac_val = np.mean(a.split == DatasetSplit.VAL)
        assert abs(frac_val - 0.15) < 0.01

    def test_visibility_rules(self):
        """Appendix A.1: message/supervision masks per output split."""
        src = np.arange(10_000)
        dst = src[::-1].copy()
        sp = TransductiveEdgeSplitter(is_disjoint_mode=True)
        asg = sp(src, dst)
        train_msg = asg.message_mask(DatasetSplit.TRAIN, is_disjoint=True)
        # Disjoint: train message edges have usage MESSAGE only.
        assert np.all(asg.usage[train_msg] == EdgeUsage.MESSAGE)
        assert np.all(asg.split[train_msg] == DatasetSplit.TRAIN)
        # VAL samples see only TRAIN-assigned edges.
        val_msg = asg.message_mask(DatasetSplit.VAL, is_disjoint=False)
        assert np.all(asg.split[val_msg] == DatasetSplit.TRAIN)
        # TEST samples see TRAIN+VAL, never TEST.
        test_msg = asg.message_mask(DatasetSplit.TEST, is_disjoint=False)
        assert not np.any(asg.split[test_msg] == DatasetSplit.TEST)
        # TRAIN supervision excludes MESSAGE-usage edges.
        train_sup = asg.supervision_mask(DatasetSplit.TRAIN)
        assert not np.any(asg.usage[train_sup] == EdgeUsage.MESSAGE)
        # Disjoint train: message and supervision sets are disjoint.
        assert not np.any(train_msg & train_sup)

    def test_seed_changes_assignment(self):
        src = np.arange(1000)
        dst = np.arange(1000)
        a = TransductiveEdgeSplitter(seed=1)(src, dst)
        b = TransductiveEdgeSplitter(seed=2)(src, dst)
        assert not np.array_equal(a.split, b.split)


class TestSelectSslPositiveEdges:
    def test_deterministic_and_sized(self):
        edges = np.stack([np.arange(100), np.arange(100)])
        a = select_ssl_positive_edges(edges, 0.1, seed=3)
        b = select_ssl_positive_edges(edges, 0.1, seed=3)
        np.testing.assert_array_equal(a, b)
        assert len(a) == 10
        assert len(np.unique(a)) == 10

    def test_bad_ratio_raises(self):
        with pytest.raises(ValueError):
            select_ssl_positive_edges(np.zeros((2, 5)), 0.0)


class TestNodeSplitAssigner:
    def test_ratios_determinism_and_coverage(self):
        from gigl_tpu.graph.splitters import NodeSplitAssigner

        a = NodeSplitAssigner(train_ratio=0.7, val_ratio=0.2, seed=5)
        asg1 = a(np.arange(50_000, dtype=np.int64))
        asg2 = a(np.arange(50_000, dtype=np.int64))
        np.testing.assert_array_equal(asg1, asg2)
        fr_train = np.mean(asg1 == DatasetSplit.TRAIN)
        fr_val = np.mean(asg1 == DatasetSplit.VAL)
        fr_test = np.mean(asg1 == DatasetSplit.TEST)
        assert abs(fr_train - 0.7) < 0.02
        assert abs(fr_val - 0.2) < 0.02
        assert abs(fr_test - 0.1) < 0.02

    def test_split_ids_partition(self):
        from gigl_tpu.graph.splitters import NodeSplitAssigner

        tr, va, te = NodeSplitAssigner().split_ids(1000)
        all_ids = np.sort(np.concatenate([tr, va, te]))
        np.testing.assert_array_equal(all_ids, np.arange(1000))

    def test_seed_changes_assignment(self):
        from gigl_tpu.graph.splitters import NodeSplitAssigner

        a = NodeSplitAssigner(seed=1)(np.arange(1000, dtype=np.int64))
        b = NodeSplitAssigner(seed=2)(np.arange(1000, dtype=np.int64))
        assert not np.array_equal(a, b)

    def test_inductive_message_mask(self):
        from gigl_tpu.graph.splitters import (
            NodeSplitAssigner,
            inductive_message_mask,
        )

        asg = NodeSplitAssigner()(np.arange(2000, dtype=np.int64))
        rng = np.random.default_rng(0)
        src = rng.integers(0, 2000, 5000)
        dst = rng.integers(0, 2000, 5000)
        for s in (DatasetSplit.TRAIN, DatasetSplit.VAL, DatasetSplit.TEST):
            m = inductive_message_mask(asg, src, dst, s)
            # Both endpoints of every visible edge live in the split
            # (ref InductiveSupervisedNodeClassificationSplitStrategy
            # pruneOutsideNodesAndEdges).
            assert np.all(asg[src[m]] == np.int8(s))
            assert np.all(asg[dst[m]] == np.int8(s))
        # The three masks partition the same-split edge set and never
        # overlap.
        masks = [inductive_message_mask(asg, src, dst, s)
                 for s in (DatasetSplit.TRAIN, DatasetSplit.VAL,
                           DatasetSplit.TEST)]
        assert not np.any(masks[0] & masks[1])
        assert not np.any(masks[0] & masks[2])


class TestUserDefinedLabelsEdgeSplitter:
    def test_partition_ratios_and_determinism(self):
        from gigl_tpu.graph.splitters import UserDefinedLabelsEdgeSplitter

        rng = np.random.default_rng(1)
        src = rng.integers(0, 10_000, 50_000)
        dst = rng.integers(0, 10_000, 50_000)
        sp = UserDefinedLabelsEdgeSplitter(train_ratio=0.8, val_ratio=0.1)
        a = sp(src, dst)
        b = sp(src, dst)
        np.testing.assert_array_equal(a, b)
        assert abs(np.mean(a == DatasetSplit.TRAIN) - 0.8) < 0.02
        assert abs(np.mean(a == DatasetSplit.VAL) - 0.1) < 0.02
        tr, va, te = sp.split_edge_indices(src, dst)
        assert len(tr) + len(va) + len(te) == len(src)

    def test_symmetric_buckets_reversed_edges_together(self):
        from gigl_tpu.graph.splitters import UserDefinedLabelsEdgeSplitter

        rng = np.random.default_rng(2)
        src = rng.integers(0, 1000, 2000)
        dst = rng.integers(0, 1000, 2000)
        sp = UserDefinedLabelsEdgeSplitter(symmetric=True)
        np.testing.assert_array_equal(sp(src, dst), sp(dst, src))

    def test_asymmetric_differs_on_reversal(self):
        from gigl_tpu.graph.splitters import UserDefinedLabelsEdgeSplitter

        rng = np.random.default_rng(3)
        src = rng.integers(0, 1000, 5000)
        dst = rng.integers(1000, 2000, 5000)
        sp = UserDefinedLabelsEdgeSplitter(symmetric=False)
        assert not np.array_equal(sp(src, dst), sp(dst, src))


class TestDownsampleRootNodes:
    def test_deterministic_uniform_prefix(self):
        from gigl_tpu.graph.splitters import downsample_root_nodes

        ids = np.arange(10_000, dtype=np.int64)
        a = downsample_root_nodes(ids, 1000, seed=7)
        b = downsample_root_nodes(ids, 1000, seed=7)
        np.testing.assert_array_equal(a, b)
        assert len(a) == 1000 and len(np.unique(a)) == 1000
        # Nested property: a larger cap contains the smaller cap's set.
        big = downsample_root_nodes(ids, 2000, seed=7)
        assert np.isin(a, big).all()
        # Roughly uniform over the id space.
        assert abs(np.mean(a < 5000) - 0.5) < 0.05

    def test_noop_cases(self):
        from gigl_tpu.graph.splitters import downsample_root_nodes

        ids = np.arange(100)
        np.testing.assert_array_equal(downsample_root_nodes(ids, 0), ids)
        np.testing.assert_array_equal(downsample_root_nodes(ids, 200), ids)
