"""C++ host engine tests: CSR parity, gather, host/device sampler parity,
TFRecord codec round-trip (+ cross-check vs a pure-python crc32c)."""

import struct

import numpy as np
import pytest

from gigl_tpu import native
from gigl_tpu.graph.csr import build_csr

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable")


class TestBuildCsrNative:
    def test_matches_python_csr(self):
        rng = np.random.default_rng(0)
        src = rng.integers(0, 200, 5000)
        dst = rng.integers(0, 200, 5000)
        py = build_csr(src, dst, num_anchor_nodes=200, anchor="dst")
        indptr, indices, edge_ids = native.build_csr_native(
            src, dst, 200, anchor="dst")
        np.testing.assert_array_equal(indptr, py.indptr)
        np.testing.assert_array_equal(indices, py.indices)
        np.testing.assert_array_equal(edge_ids, py.edge_ids)

    def test_anchor_src(self):
        src = np.array([0, 1, 1, 2])
        dst = np.array([1, 2, 0, 0])
        indptr, indices, _ = native.build_csr_native(src, dst, 3, anchor="src")
        py = build_csr(src, dst, num_anchor_nodes=3, anchor="src")
        np.testing.assert_array_equal(indptr, py.indptr)
        np.testing.assert_array_equal(indices, py.indices)

    def test_out_of_range_raises(self):
        with pytest.raises(ValueError):
            native.build_csr_native(np.array([0]), np.array([5]), 3)


class TestHostFeatureStore:
    def test_gather_matches_numpy(self):
        rng = np.random.default_rng(1)
        table = rng.normal(size=(500, 32)).astype(np.float32)
        store = native.HostFeatureStore(table)
        idx = rng.integers(0, 500, (7, 13))
        np.testing.assert_array_equal(store.gather(idx), table[idx])

    def test_large_threaded_gather(self):
        rng = np.random.default_rng(2)
        table = rng.normal(size=(10_000, 64)).astype(np.float32)
        store = native.HostFeatureStore(table)
        idx = rng.integers(0, 10_000, 100_000)
        np.testing.assert_array_equal(store.gather(idx), table[idx])

    def test_memmap_out_of_core(self, tmp_path):
        rng = np.random.default_rng(3)
        table = rng.normal(size=(256, 16)).astype(np.float32)
        path = tmp_path / "feats.bin"
        table.tofile(path)
        store = native.HostFeatureStore.from_memmap(str(path), 256, 16)
        idx = rng.integers(0, 256, 50)
        np.testing.assert_array_equal(store.gather(idx), table[idx])

    def test_bad_index_raises(self):
        store = native.HostFeatureStore(np.zeros((4, 2), np.float32))
        with pytest.raises(IndexError):
            store.gather(np.array([9]))


class TestHostDeviceSamplerParity:
    def test_bit_identical_to_device_sampler(self):
        import jax.numpy as jnp

        from gigl_tpu.sampling.neighbor_sampler import (
            DeviceCSR,
            sample_neighbors,
        )

        rng = np.random.default_rng(4)
        src = rng.integers(0, 300, 8000)
        dst = rng.integers(0, 300, 8000)
        csr = build_csr(src, dst, num_anchor_nodes=300, anchor="dst")
        roots = rng.integers(0, 300, 64).astype(np.int32)

        h_nbr, h_mask, h_slots = native.sample_fanout_native(
            csr.indptr, csr.indices, roots, 10, seed=42, hop=3)

        dcsr = DeviceCSR.from_csr(csr)
        d_nbr, d_mask, d_slots = sample_neighbors(
            dcsr, jnp.asarray(roots), 10, seed=42, hop=3)
        np.testing.assert_array_equal(h_nbr, np.asarray(d_nbr))
        np.testing.assert_array_equal(h_mask, np.asarray(d_mask))
        np.testing.assert_array_equal(h_slots, np.asarray(d_slots))

    def test_isolated_nodes_masked(self):
        indptr = np.array([0, 0, 2], np.int64)  # node 0 isolated
        indices = np.array([0, 1], np.int32)
        nbr, mask, _ = native.sample_fanout_native(
            indptr, indices, np.array([0], np.int32), 4, seed=0, hop=1)
        assert not mask.any()


def _py_masked_crc32c(data: bytes) -> int:
    # Independent pure-python crc32c (Castagnoli) reference.
    poly = 0x82F63B78
    crc = 0xFFFFFFFF
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = (crc >> 1) ^ (poly if crc & 1 else 0)
    crc ^= 0xFFFFFFFF
    return (((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF


class TestTFRecordCodec:
    def test_roundtrip(self, tmp_path):
        payloads = [b"hello", b"", b"x" * 1000, bytes(range(256))]
        path = str(tmp_path / "data.tfrecord")
        assert native.tfrecord_write(path, payloads) == 4
        got = list(native.tfrecord_read(path))
        assert got == payloads

    def test_crc_matches_reference_implementation(self):
        lib = native.get_lib()
        import ctypes

        for payload in (b"abc", b"", b"tfrecord!", bytes(1000)):
            arr = np.frombuffer(payload, np.uint8) if payload else np.zeros(
                0, np.uint8)
            ptr = arr.ctypes.data_as(ctypes.c_void_p) if len(payload) else (
                ctypes.c_void_p(0))
            got = lib.gigl_masked_crc32c(ptr, len(payload))
            assert got == _py_masked_crc32c(payload)

    def test_corruption_detected(self, tmp_path):
        path = str(tmp_path / "bad.tfrecord")
        native.tfrecord_write(path, [b"payload"])
        data = bytearray(open(path, "rb").read())
        data[14] ^= 0xFF  # flip a payload byte
        open(path, "wb").write(bytes(data))
        with pytest.raises(ValueError, match="corrupt"):
            list(native.tfrecord_read(path))

    def test_tf_frame_layout(self, tmp_path):
        """Frame layout must match the TFRecord spec: u64 len + masked crc
        of the length bytes, payload, masked crc of payload."""
        path = str(tmp_path / "one.tfrecord")
        native.tfrecord_write(path, [b"spam"])
        raw = open(path, "rb").read()
        (length,) = struct.unpack("<Q", raw[:8])
        assert length == 4
        (lcrc,) = struct.unpack("<I", raw[8:12])
        assert lcrc == _py_masked_crc32c(raw[:8])
        assert raw[12:16] == b"spam"
        (dcrc,) = struct.unpack("<I", raw[16:20])
        assert dcrc == _py_masked_crc32c(b"spam")
