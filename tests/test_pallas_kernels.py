"""Pallas gather kernels: CPU-fallback numerics + QuantizedTable API.

(The TPU Pallas path is exercised on the real chip by /tmp drive scripts and
bench runs; under the CPU test mesh the XLA fallback is what executes —
asserting identical semantics across backends.)"""

import jax.numpy as jnp
import numpy as np

from gigl_tpu.ops.pallas_kernels import (
    QuantizedTable,
    gather_rows,
    gather_rows_int8,
)


class TestGatherRows:
    def test_matches_direct_indexing(self):
        rng = np.random.default_rng(0)
        table = jnp.asarray(rng.normal(size=(100, 16)).astype(np.float32))
        idx = jnp.asarray(rng.integers(0, 100, 37).astype(np.int32))
        out = gather_rows(table, idx)
        np.testing.assert_allclose(np.asarray(out),
                                   np.asarray(table)[np.asarray(idx)])

    def test_empty_and_single(self):
        table = jnp.ones((10, 4), jnp.float32)
        out = gather_rows(table, jnp.asarray([3], jnp.int32))
        assert out.shape == (1, 4)


class TestQuantizedTable:
    def test_roundtrip_error_bounded(self):
        rng = np.random.default_rng(1)
        x = rng.normal(size=(200, 32)).astype(np.float32) * 10
        qt = QuantizedTable.quantize(x)
        idx = rng.integers(0, 200, 64)
        got = np.asarray(qt[idx])
        ref = x[idx]
        # Symmetric per-row int8: max error = scale/2 = absmax/254.
        absmax = np.abs(x[idx]).max(axis=1, keepdims=True)
        assert (np.abs(got - ref) <= absmax / 127.0).all()

    def test_multidim_index_shapes(self):
        x = np.random.default_rng(2).normal(size=(50, 8)).astype(np.float32)
        qt = QuantizedTable.quantize(x)
        idx = np.arange(12).reshape(3, 4)
        out = qt[idx]
        assert out.shape == (3, 4, 8)
        np.testing.assert_allclose(
            np.asarray(out),
            np.asarray(qt[idx.reshape(-1)]).reshape(3, 4, 8))

    def test_gather_rows_int8_matches_xla_formula(self):
        rng = np.random.default_rng(3)
        x = rng.normal(size=(64, 16)).astype(np.float32)
        qt = QuantizedTable.quantize(x)
        idx = jnp.asarray(rng.integers(0, 64, 20).astype(np.int32))
        got = gather_rows_int8(qt.q, qt.scale, idx)
        ref = (np.asarray(qt.q)[np.asarray(idx)].astype(np.float32)
               * np.asarray(qt.scale)[np.asarray(idx)])
        np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-6)

    def test_zero_row_safe(self):
        x = np.zeros((4, 8), np.float32)
        qt = QuantizedTable.quantize(x)
        out = np.asarray(qt[np.array([0, 1])])
        assert np.isfinite(out).all() and (out == 0).all()
