"""Tests for segment/fanout ops against NumPy references."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gigl_tpu.ops.fanout import (
    fanout_aggregate,
    masked_max,
    masked_mean,
    masked_softmax,
    masked_sum,
)
from gigl_tpu.ops.segment import (
    coo_spmm,
    sddmm,
    segment_max,
    segment_mean,
    segment_softmax,
    segment_sum,
)


class TestSegmentOps:
    def setup_method(self):
        rng = np.random.default_rng(0)
        self.E, self.N, self.D = 200, 20, 8
        self.data = rng.normal(size=(self.E, self.D)).astype(np.float32)
        self.seg = rng.integers(0, self.N, self.E)

    def test_segment_sum_mean(self):
        s = segment_sum(jnp.array(self.data), jnp.array(self.seg), self.N)
        m = segment_mean(jnp.array(self.data), jnp.array(self.seg), self.N)
        for v in range(self.N):
            rows = self.data[self.seg == v]
            np.testing.assert_allclose(s[v], rows.sum(0) if len(rows) else 0, rtol=1e-5, atol=1e-5)
            if len(rows):
                np.testing.assert_allclose(m[v], rows.mean(0), rtol=1e-5, atol=1e-5)

    def test_segment_max_empty_is_zero(self):
        seg = np.zeros(4, dtype=np.int32)  # all into segment 0, segment 1 empty
        out = segment_max(jnp.array(self.data[:4]), jnp.array(seg), 2)
        np.testing.assert_allclose(out[1], np.zeros(self.D))
        np.testing.assert_allclose(out[0], self.data[:4].max(0), rtol=1e-6)

    def test_segment_softmax_sums_to_one(self):
        logits = jnp.array(np.random.default_rng(1).normal(size=self.E).astype(np.float32))
        p = segment_softmax(logits, jnp.array(self.seg), self.N)
        sums = jax.ops.segment_sum(p, jnp.array(self.seg), num_segments=self.N)
        occupied = np.bincount(self.seg, minlength=self.N) > 0
        np.testing.assert_allclose(np.asarray(sums)[occupied], 1.0, rtol=1e-5)

    def test_coo_spmm_matches_dense(self):
        rng = np.random.default_rng(3)
        src = rng.integers(0, 10, 50)
        dst = rng.integers(0, 12, 50)
        x = rng.normal(size=(10, 4)).astype(np.float32)
        A = np.zeros((12, 10), dtype=np.float32)
        for s, d in zip(src, dst):
            A[d, s] += 1.0
        out = coo_spmm(jnp.array(src), jnp.array(dst), jnp.array(x), 12, reduce="sum")
        np.testing.assert_allclose(out, A @ x, rtol=1e-4, atol=1e-5)

    def test_coo_spmm_weighted_mean(self):
        src = np.array([0, 1]); dst = np.array([0, 0])
        x = np.eye(2, dtype=np.float32)
        w = np.array([2.0, 4.0], dtype=np.float32)
        out = coo_spmm(jnp.array(src), jnp.array(dst), jnp.array(x), 1,
                       edge_weight=jnp.array(w), reduce="mean")
        np.testing.assert_allclose(out[0], [1.0, 2.0], rtol=1e-6)

    def test_sddmm(self):
        rng = np.random.default_rng(4)
        q = rng.normal(size=(6, 3)).astype(np.float32)
        k = rng.normal(size=(5, 3)).astype(np.float32)
        src = np.array([0, 2, 4]); dst = np.array([1, 1, 5])
        out = sddmm(jnp.array(src), jnp.array(dst), jnp.array(q), jnp.array(k))
        expect = np.array([q[1] @ k[0], q[1] @ k[2], q[5] @ k[4]])
        np.testing.assert_allclose(out, expect, rtol=1e-5)


class TestFanoutOps:
    def setup_method(self):
        rng = np.random.default_rng(5)
        self.x = rng.normal(size=(30, 6)).astype(np.float32)
        self.idx = rng.integers(0, 30, (4, 5))
        self.mask = rng.random((4, 5)) > 0.3

    def test_masked_mean_matches_numpy(self):
        out = fanout_aggregate(jnp.array(self.x), jnp.array(self.idx),
                               jnp.array(self.mask), reduce="mean")
        for n in range(4):
            valid = self.idx[n][self.mask[n]]
            expect = self.x[valid].mean(0) if len(valid) else np.zeros(6)
            np.testing.assert_allclose(out[n], expect, rtol=1e-5, atol=1e-6)

    def test_masked_max_and_sum(self):
        feats = jnp.array(self.x)[jnp.array(self.idx)]
        mx = masked_max(feats, jnp.array(self.mask))
        sm = masked_sum(feats, jnp.array(self.mask))
        for n in range(4):
            valid = self.idx[n][self.mask[n]]
            if len(valid):
                np.testing.assert_allclose(mx[n], self.x[valid].max(0), rtol=1e-6)
            else:
                np.testing.assert_allclose(mx[n], 0.0)
            np.testing.assert_allclose(
                sm[n], self.x[valid].sum(0) if len(valid) else 0, rtol=1e-5, atol=1e-6)

    def test_masked_softmax(self):
        logits = jnp.array(np.random.default_rng(6).normal(size=(4, 5)).astype(np.float32))
        p = masked_softmax(logits, jnp.array(self.mask))
        p = np.asarray(p)
        assert np.all(p[~self.mask] == 0)
        rows_with_valid = self.mask.any(1)
        np.testing.assert_allclose(p[rows_with_valid].sum(1), 1.0, rtol=1e-5)

    def test_edge_weighted_aggregate(self):
        w = np.random.default_rng(7).random((4, 5)).astype(np.float32)
        out = fanout_aggregate(jnp.array(self.x), jnp.array(self.idx),
                               jnp.array(self.mask), reduce="sum",
                               edge_weight=jnp.array(w))
        for n in range(4):
            expect = sum(w[n, k] * self.x[self.idx[n, k]]
                         for k in range(5) if self.mask[n, k])
            np.testing.assert_allclose(out[n], expect if self.mask[n].any() else np.zeros(6),
                                       rtol=1e-5, atol=1e-6)

    def test_jit_and_grad(self):
        f = jax.jit(lambda x: fanout_aggregate(
            x, jnp.array(self.idx), jnp.array(self.mask), reduce="mean").sum())
        g = jax.grad(f)(jnp.array(self.x))
        assert g.shape == self.x.shape
        assert bool(jnp.isfinite(g).all())
