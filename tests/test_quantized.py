"""Quantized feature tables (ops/quantized.py): int32-packed int8 rows.

Replaces tests/test_pallas_kernels.py — the manual-DMA Pallas gather
kernels were deleted after measuring them slower than XLA's gather on the
target chip (module docstring / docs/performance.md); the shipped fast
path is the int32-packed XLA dequant gather.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gigl_tpu.ops.quantized import QuantizedTable, _unpack_int32_rows


class TestQuantizedTable:
    def test_roundtrip_error_bounded(self):
        x = np.random.default_rng(0).normal(size=(50, 16)).astype(np.float32)
        t = QuantizedTable.quantize(x)
        assert t.packed  # 16 % 4 == 0 -> int32-packed layout
        out = np.asarray(t[np.arange(50)])
        absmax = np.abs(x).max(axis=1, keepdims=True)
        tol = absmax / 127.0 * 0.51 + 1e-7
        assert (np.abs(out - x) <= tol).all()

    def test_unpacked_fallback_when_dim_not_multiple_of_4(self):
        x = np.random.default_rng(1).normal(size=(20, 7)).astype(np.float32)
        t = QuantizedTable.quantize(x)
        assert not t.packed
        out = np.asarray(t[np.arange(20)])
        absmax = np.abs(x).max(axis=1, keepdims=True)
        assert (np.abs(out - x) <= absmax / 127.0 * 0.51 + 1e-7).all()

    def test_packed_equals_unpacked_semantics(self):
        """The int32-packed gather must reproduce the plain int8 dequant
        formula exactly (same q, same scales)."""
        x = np.random.default_rng(2).normal(size=(30, 12)).astype(np.float32)
        t = QuantizedTable.quantize(x)
        idx = np.array([3, 0, 29, 3])
        q_int8 = np.asarray(t.q).view(np.int8).reshape(30, 12)
        want = q_int8[idx].astype(np.float32) * np.asarray(t.scale)[idx]
        np.testing.assert_allclose(np.asarray(t[idx]), want, rtol=0, atol=0)

    def test_multidim_index_shapes(self):
        x = np.random.default_rng(3).normal(size=(40, 8)).astype(np.float32)
        t = QuantizedTable.quantize(x)
        assert t.shape == (40, 8)
        out = t[jnp.zeros((4, 5), jnp.int32)]
        assert out.shape == (4, 5, 8)

    def test_pytree_and_jit(self):
        x = np.random.default_rng(4).normal(size=(16, 8)).astype(np.float32)
        t = QuantizedTable.quantize(x)

        @jax.jit
        def f(tab, i):
            return tab[i].sum(-1)

        out = f(t, jnp.arange(16))
        assert out.shape == (16,)
        leaves, treedef = jax.tree_util.tree_flatten(t)
        t2 = jax.tree_util.tree_unflatten(treedef, leaves)
        np.testing.assert_array_equal(np.asarray(t2[np.arange(4)]),
                                      np.asarray(t[np.arange(4)]))

    def test_unpack_helper_sign_extension(self):
        q = np.array([[-128, -1, 0, 127]], np.int8)
        packed = jnp.asarray(q.view(np.int32))
        out = np.asarray(_unpack_int32_rows(packed))
        np.testing.assert_array_equal(out, [[-128.0, -1.0, 0.0, 127.0]])
