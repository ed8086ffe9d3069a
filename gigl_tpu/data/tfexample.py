"""tf.train.Example wire-format codec (pure Python, no TensorFlow).

Ref parity: every feature artifact in the reference is TFRecords of
tf.train.Example protos — written by the Beam preprocessor
(`data_preprocessor/lib/transform/utils.py:42` InstanceDictToTFExample) and
read back by tf.data loaders (`common/data/dataloaders.py`). This module
implements the protobuf wire format for the Example message family
directly, so the TPU framework can read/write reference-compatible files
(through gigl_tpu.native's TFRecord framing) without a TF dependency.

Message schema (tensorflow/core/example/{example,feature}.proto):
  Example        { Features features = 1; }
  Features       { map<string, Feature> feature = 1; }
  Feature        { oneof { BytesList bytes_list = 1;
                           FloatList float_list = 2;
                           Int64List int64_list = 3; } }
  BytesList      { repeated bytes value = 1; }
  FloatList      { repeated float value = 1 [packed = true]; }
  Int64List      { repeated int64 value = 1 [packed = true]; }
"""

from __future__ import annotations

import struct
from typing import Dict, Iterable, List, Tuple, Union

import numpy as np

FeatureValue = Union[np.ndarray, List[float], List[int], List[bytes], bytes,
                     float, int]


# ---------------------------------------------------------------------------
# varint / wire primitives
# ---------------------------------------------------------------------------

def _write_varint(out: bytearray, v: int) -> None:
    if v < 0:
        v += 1 << 64
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _read_varint(buf: bytes, pos: int) -> Tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7
        if shift >= 70:
            raise ValueError("malformed varint")


def _tag(field: int, wire: int) -> int:
    return (field << 3) | wire


def _write_len_delimited(out: bytearray, field: int, payload: bytes) -> None:
    _write_varint(out, _tag(field, 2))
    _write_varint(out, len(payload))
    out += payload


# ---------------------------------------------------------------------------
# encode
# ---------------------------------------------------------------------------

def _encode_feature(value: FeatureValue) -> bytes:
    """Encode one Feature message from a python/numpy value."""
    inner = bytearray()
    if isinstance(value, bytes):
        value = [value]
    if isinstance(value, (float, int, np.floating, np.integer)):
        value = [value]
    if isinstance(value, np.ndarray):
        value = value.reshape(-1)
        if np.issubdtype(value.dtype, np.floating):
            value = [float(v) for v in value]
        elif np.issubdtype(value.dtype, np.integer):
            value = [int(v) for v in value]
        else:
            raise TypeError(f"unsupported array dtype {value.dtype}")
    if not isinstance(value, (list, tuple)):
        raise TypeError(f"unsupported feature value {type(value)}")
    if len(value) and isinstance(value[0], bytes):
        bl = bytearray()
        for v in value:
            _write_len_delimited(bl, 1, v)
        _write_len_delimited(inner, 1, bytes(bl))  # bytes_list = field 1
    elif len(value) and isinstance(value[0], float):
        packed = struct.pack(f"<{len(value)}f", *value)
        fl = bytearray()
        _write_varint(fl, _tag(1, 2))
        _write_varint(fl, len(packed))
        fl += packed
        _write_len_delimited(inner, 2, bytes(fl))  # float_list = field 2
    else:  # ints (or empty -> emit empty int64_list)
        il = bytearray()
        if value:
            packed = bytearray()
            for v in value:
                _write_varint(packed, int(v))
            _write_varint(il, _tag(1, 2))
            _write_varint(il, len(packed))
            il += packed
        _write_len_delimited(inner, 3, bytes(il))  # int64_list = field 3
    return bytes(inner)


def encode_example(features: Dict[str, FeatureValue]) -> bytes:
    """Dict -> serialized tf.train.Example bytes."""
    feats = bytearray()
    for name in features:
        entry = bytearray()
        _write_len_delimited(entry, 1, name.encode("utf-8"))   # map key
        _write_len_delimited(entry, 2, _encode_feature(features[name]))
        _write_len_delimited(feats, 1, bytes(entry))           # map entry
    out = bytearray()
    _write_len_delimited(out, 1, bytes(feats))                 # features = 1
    return bytes(out)


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------

def _iter_fields(buf: bytes):
    pos = 0
    n = len(buf)
    while pos < n:
        key, pos = _read_varint(buf, pos)
        field, wire = key >> 3, key & 7
        if wire == 2:
            ln, pos = _read_varint(buf, pos)
            yield field, buf[pos: pos + ln]
            pos += ln
        elif wire == 0:
            v, pos = _read_varint(buf, pos)
            yield field, v
        elif wire == 5:
            yield field, buf[pos: pos + 4]
            pos += 4
        elif wire == 1:
            yield field, buf[pos: pos + 8]
            pos += 8
        else:
            raise ValueError(f"unsupported wire type {wire}")


def _decode_feature(buf: bytes):
    for field, payload in _iter_fields(buf):
        if field == 1:  # bytes_list
            return [p for f, p in _iter_fields(payload) if f == 1]
        if field == 2:  # float_list (packed or repeated)
            vals: List[float] = []
            for f, p in _iter_fields(payload):
                if f != 1:
                    continue
                if isinstance(p, bytes) and len(p) != 4:
                    vals.extend(struct.unpack(f"<{len(p) // 4}f", p))
                elif isinstance(p, bytes):
                    vals.append(struct.unpack("<f", p)[0])
            return np.asarray(vals, np.float32)
        if field == 3:  # int64_list
            vals = []
            for f, p in _iter_fields(payload):
                if f != 1:
                    continue
                if isinstance(p, bytes):
                    pos = 0
                    while pos < len(p):
                        v, pos = _read_varint(p, pos)
                        if v >= 1 << 63:
                            v -= 1 << 64
                        vals.append(v)
                else:
                    v = p if p < 1 << 63 else p - (1 << 64)
                    vals.append(v)
            return np.asarray(vals, np.int64)
    return np.asarray([], np.float32)  # empty Feature


def decode_example(data: bytes) -> Dict[str, Union[np.ndarray, List[bytes]]]:
    """Serialized tf.train.Example bytes -> dict of arrays/bytes lists."""
    out: Dict[str, Union[np.ndarray, List[bytes]]] = {}
    for field, payload in _iter_fields(data):
        if field != 1:
            continue
        for f2, entry in _iter_fields(payload):
            if f2 != 1:
                continue
            name = None
            feat = None
            for f3, p3 in _iter_fields(entry):
                if f3 == 1:
                    name = p3.decode("utf-8")
                elif f3 == 2:
                    feat = _decode_feature(p3)
            if name is not None:
                out[name] = feat if feat is not None else np.asarray([])
    return out


# ---------------------------------------------------------------------------
# file-level helpers (TFRecord framing via the native codec)
# ---------------------------------------------------------------------------

def write_examples(path: str, rows: Iterable[Dict[str, FeatureValue]]) -> int:
    from gigl_tpu import native

    return native.tfrecord_write(path, (encode_example(r) for r in rows))


def read_examples(path: str):
    from gigl_tpu import native

    for payload in native.tfrecord_read(path):
        yield decode_example(payload)
