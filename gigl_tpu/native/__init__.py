"""ctypes bindings for the gigl_tpu C++ host engine (see src/gigl_native.cpp).

Builds the shared library on first use with g++ (cached next to the
source; pybind11 is not available in this image, so the C ABI + ctypes is
the binding layer). All entry points accept/return NumPy arrays.

Ref parity: host-side replacement for the GLT C++ engine duties —
CSR store build, feature gather, deterministic neighbor sampling
(`python/gigl/distributed/` wraps GLT's C++ workers), plus the TFRecord
record codec used for every inter-stage artifact in the reference.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "src", "gigl_native.cpp")
_LIB_PATH = os.path.join(os.path.dirname(__file__), "src", "libgigl_native.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None


class NativeUnavailable(RuntimeError):
    pass


def _build() -> str:
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           "-pthread", _SRC, "-o", _LIB_PATH]
    proc = subprocess.run(cmd, capture_output=True, text=True)
    if proc.returncode != 0:
        raise NativeUnavailable(
            f"native build failed:\n{proc.stderr[-2000:]}")
    return _LIB_PATH


def get_lib() -> ctypes.CDLL:
    """Load (building if needed) the native library; raises
    NativeUnavailable when no toolchain is present."""
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_LIB_PATH) or (
                os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC)):
            _build()
        lib = ctypes.CDLL(_LIB_PATH)
        i64, i32, u32, u8, f32, vp = (
            ctypes.c_int64, ctypes.c_int32, ctypes.c_uint32, ctypes.c_uint8,
            ctypes.c_float, ctypes.c_void_p)
        lib.gigl_build_csr.restype = i64
        lib.gigl_build_csr.argtypes = [vp, vp, i64, i64, ctypes.c_int,
                                       vp, vp, vp]
        lib.gigl_gather_f32.restype = i64
        lib.gigl_gather_f32.argtypes = [vp, i64, i64, vp, i64, vp,
                                        ctypes.c_int]
        lib.gigl_sample_fanout.restype = i64
        lib.gigl_sample_fanout.argtypes = [vp, vp, i64, i64, vp, i64, i32,
                                           u32, u32, vp, vp, vp, ctypes.c_int]
        lib.gigl_masked_crc32c.restype = u32
        lib.gigl_masked_crc32c.argtypes = [vp, i64]
        lib.gigl_tfrecord_encode.restype = i64
        lib.gigl_tfrecord_encode.argtypes = [vp, i64, vp]
        lib.gigl_tfrecord_scan.restype = i64
        lib.gigl_tfrecord_scan.argtypes = [vp, i64, vp, vp, i64, ctypes.c_int]
        lib.gigl_expand_gather.restype = i64
        lib.gigl_expand_gather.argtypes = [vp, vp, i64, vp, vp, i64, i64,
                                           vp, i64, vp, i64, vp,
                                           vp, vp, vp, vp, vp, ctypes.c_int]
        _lib = lib
        return _lib


def available() -> bool:
    try:
        get_lib()
        return True
    except Exception:
        return False


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.c_void_p)


_DEFAULT_THREADS = max(1, (os.cpu_count() or 2) - 1)


# ---------------------------------------------------------------------------
# CSR build
# ---------------------------------------------------------------------------

def build_csr_native(src: np.ndarray, dst: np.ndarray, num_anchor_nodes: int,
                     anchor: str = "dst"
                     ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Counting-sort CSR build (indptr i64, indices i32, edge_ids i64);
    same layout contract as gigl_tpu.graph.csr.build_csr."""
    lib = get_lib()
    src = np.ascontiguousarray(src, np.int64)
    dst = np.ascontiguousarray(dst, np.int64)
    e = len(src)
    indptr = np.empty(num_anchor_nodes + 1, np.int64)
    indices = np.empty(e, np.int32)
    edge_ids = np.empty(e, np.int64)
    rc = lib.gigl_build_csr(_ptr(src), _ptr(dst), e, num_anchor_nodes,
                            1 if anchor == "dst" else 0, _ptr(indptr),
                            _ptr(indices), _ptr(edge_ids))
    if rc != 0:
        raise ValueError("anchor id out of range in build_csr_native")
    return indptr, indices, edge_ids


# ---------------------------------------------------------------------------
# Feature store (in-RAM or mmap out-of-core)
# ---------------------------------------------------------------------------

class HostFeatureStore:
    """Host-resident [N, D] float32 feature table with threaded gather.

    ``from_memmap`` serves out-of-core tables (page-cache-backed), the
    MAG240M-scale story: features too big for HBM stay on host/disk and
    batches are gathered per step (ref: GLT feature stores + UVA lookup).
    """

    def __init__(self, table: np.ndarray, num_threads: int = 0):
        if table.ndim != 2 or table.dtype != np.float32:
            raise ValueError("HostFeatureStore needs [N, D] float32")
        self.table = table
        self.num_threads = num_threads or _DEFAULT_THREADS

    @classmethod
    def from_memmap(cls, path: str, num_nodes: int, dim: int,
                    num_threads: int = 0) -> "HostFeatureStore":
        mm = np.memmap(path, dtype=np.float32, mode="r",
                       shape=(num_nodes, dim))
        return cls(np.asarray(mm), num_threads)

    def gather(self, idx: np.ndarray) -> np.ndarray:
        lib = get_lib()
        idx = np.ascontiguousarray(idx, np.int64)
        shape = idx.shape
        flat = idx.reshape(-1)
        n, d = self.table.shape
        out = np.empty((len(flat), d), np.float32)
        rc = lib.gigl_gather_f32(_ptr(self.table), n, d, _ptr(flat),
                                 len(flat), _ptr(out), self.num_threads)
        if rc != 0:
            raise IndexError(
                f"gather index out of range at flat position {-rc - 1}")
        return out.reshape(shape + (d,))


# ---------------------------------------------------------------------------
# Host neighbor sampler
# ---------------------------------------------------------------------------

def sample_fanout_native(
    indptr: np.ndarray, indices: np.ndarray, roots: np.ndarray, fanout: int,
    *, seed: int, hop: int, num_threads: int = 0,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Host-side uniform fanout sampling, bit-identical to the device
    sampler's uniform path (counter-RNG keyed by (seed, node, hop, slot))."""
    lib = get_lib()
    indptr = np.ascontiguousarray(indptr, np.int64)
    indices = np.ascontiguousarray(indices, np.int32)
    roots = np.ascontiguousarray(roots, np.int32)
    r = len(roots)
    nbr = np.empty((r, fanout), np.int32)
    mask = np.empty((r, fanout), np.uint8)
    slots = np.empty((r, fanout), np.int64)
    rc = lib.gigl_sample_fanout(
        _ptr(indptr), _ptr(indices), len(indptr) - 1, len(indices),
        _ptr(roots), r, fanout, seed & 0xFFFFFFFF, hop & 0xFFFFFFFF,
        _ptr(nbr), _ptr(mask), _ptr(slots), num_threads or _DEFAULT_THREADS)
    if rc != 0:
        raise IndexError(f"root id out of range at position {-rc - 1}")
    return nbr, mask.astype(bool), slots


# ---------------------------------------------------------------------------
# TFRecord codec
# ---------------------------------------------------------------------------

def tfrecord_write(path: str, payloads) -> int:
    """Write records to a TFRecord file (crc32c framed). Returns count."""
    lib = get_lib()
    count = 0
    with open(path, "wb") as f:
        for p in payloads:
            p = bytes(p)
            buf = np.empty(16 + len(p), np.uint8)
            pay = np.frombuffer(p, np.uint8)
            n = lib.gigl_tfrecord_encode(
                _ptr(pay) if len(p) else ctypes.c_void_p(0), len(p),
                _ptr(buf))
            f.write(buf[:n].tobytes())
            count += 1
    return count


def tfrecord_read(path: str, check_crc: bool = True):
    """Yield record payload bytes from a TFRecord file."""
    lib = get_lib()
    data = np.fromfile(path, np.uint8)
    size = len(data)
    if size == 0:
        return
    max_rec = max(1, size // 12)
    offs = np.empty(max_rec, np.int64)
    lens = np.empty(max_rec, np.int64)
    n = lib.gigl_tfrecord_scan(_ptr(data), size, _ptr(offs), _ptr(lens),
                               max_rec, 1 if check_crc else 0)
    if n < 0:
        raise ValueError(f"corrupt TFRecord at byte {-n - 1} in {path}")
    raw = data.tobytes()
    for i in range(n):
        yield raw[offs[i]: offs[i] + lens[i]]


# ---------------------------------------------------------------------------
# Fused tree-level expansion + multi-table gather
# ---------------------------------------------------------------------------

def expand_gather(
    frontier: np.ndarray,
    parent_mask: Optional[np.ndarray],
    ids_table: Optional[np.ndarray],
    mask_table: Optional[np.ndarray],
    feats: np.ndarray,
    agg: np.ndarray,
    degrees: np.ndarray,
    num_threads: int = 0,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """One streamed-training tree level in ONE native call (the GLT
    async-worker analog, see gigl_native.cpp gigl_expand_gather): expand
    ``frontier`` through the frozen sample table and gather feature /
    hopcache-aggregate / degree rows for every child in a single threaded
    pass.

    With ``ids_table=None``: root level — gather-only over ``frontier``
    (returned ids/mask are the inputs).

    Returns (ids, mask, feats, agg, degs); child arrays have shape
    frontier.shape + (K,) (+ feature dim).
    """
    lib = get_lib()
    frontier = np.ascontiguousarray(frontier, np.int32)
    shape = frontier.shape
    flat = frontier.reshape(-1)
    m = flat.shape[0]
    feats = np.ascontiguousarray(feats, np.float32)
    agg = np.ascontiguousarray(agg, np.float32)
    degrees = np.ascontiguousarray(degrees, np.float32)
    n, df = feats.shape
    da = agg.shape[1]
    # The C++ kernel bounds-checks node ids against n = feats.shape[0] only;
    # a shorter agg/degrees/ids_table would be silent OOB reads.
    if agg.shape[0] != n or degrees.shape[0] != n:
        raise ValueError(
            f"expand_gather: agg rows {agg.shape[0]} / degrees rows "
            f"{degrees.shape[0]} must equal feats rows {n}")
    if ids_table is not None and np.asarray(ids_table).shape[0] != n:
        raise ValueError(
            f"expand_gather: ids_table rows {np.asarray(ids_table).shape[0]} "
            f"must equal feats rows {n}")
    if parent_mask is None:
        pm = np.ones(m, np.uint8)
    else:
        pm = np.ascontiguousarray(
            parent_mask.reshape(-1).astype(np.uint8))
    if ids_table is None:
        out_f = np.empty((m, df), np.float32)
        out_a = np.empty((m, da), np.float32)
        out_d = np.empty((m,), np.float32)
        rc = lib.gigl_expand_gather(
            _ptr(flat), _ptr(pm), m, None, None, n, 0,
            _ptr(feats), df, _ptr(agg), da, _ptr(degrees),
            None, None, _ptr(out_f), _ptr(out_a), _ptr(out_d),
            num_threads or _DEFAULT_THREADS)
        if rc != 0:
            raise ValueError("expand_gather: node id out of range")
        return (frontier, pm.reshape(shape).astype(bool),
                out_f.reshape(shape + (df,)), out_a.reshape(shape + (da,)),
                out_d.reshape(shape))
    ids_table = np.ascontiguousarray(ids_table, np.int32)
    mask_table = np.ascontiguousarray(mask_table.astype(np.uint8))
    k = ids_table.shape[1]
    out_ids = np.empty((m * k,), np.int32)
    out_mask = np.empty((m * k,), np.uint8)
    out_f = np.empty((m * k, df), np.float32)
    out_a = np.empty((m * k, da), np.float32)
    out_d = np.empty((m * k,), np.float32)
    rc = lib.gigl_expand_gather(
        _ptr(flat), _ptr(pm), m, _ptr(ids_table), _ptr(mask_table), n, k,
        _ptr(feats), df, _ptr(agg), da, _ptr(degrees),
        _ptr(out_ids), _ptr(out_mask), _ptr(out_f), _ptr(out_a), _ptr(out_d),
        num_threads or _DEFAULT_THREADS)
    if rc != 0:
        raise ValueError("expand_gather: node id out of range")
    cs = shape + (k,)
    return (out_ids.reshape(cs), out_mask.reshape(cs).astype(bool),
            out_f.reshape(cs + (df,)), out_a.reshape(cs + (da,)),
            out_d.reshape(cs))
