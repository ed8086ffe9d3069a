"""Vectorized host-side dtype casts for the streaming data paths.

numpy's ``astype(ml_dtypes.bfloat16)`` routes through a per-element
user-dtype loop — measured 80 ms for one streamed-partitioned answer
block (24.5k x 257 f32) on this box, 7x the C++ gather that produced
it. bfloat16 is the upper 16 bits of an IEEE float32 with
round-to-nearest-even, so the cast is three vector ops on the uint32
view; bit-identical to ml_dtypes' own RNE conversion (tested in
tests/test_streaming_partitioned.py).
"""

from __future__ import annotations

import numpy as np


def to_bfloat16(x: np.ndarray) -> np.ndarray:
    """float32 -> bfloat16, round-to-nearest-even, fully vectorized."""
    import ml_dtypes

    x = np.ascontiguousarray(x, np.float32)
    u = x.view(np.uint32)
    lsb = (u >> np.uint32(16)) & np.uint32(1)
    with np.errstate(over="ignore"):
        out = ((u + np.uint32(0x7FFF) + lsb) >> np.uint32(16)).astype(
            np.uint16)
    # NaN payloads must not carry into the exponent: quiet them.
    nan = np.isnan(x)
    if nan.any():
        out = np.where(nan, np.uint16(0x7FC0), out)
    return out.view(ml_dtypes.bfloat16).reshape(x.shape)


def answer_cast(np_dtype):
    """Cast-to-answer-dtype helper for the streamed trainers: fast bf16
    path, pass-through/ascontiguous otherwise."""
    import ml_dtypes

    if np_dtype == ml_dtypes.bfloat16:
        return to_bfloat16
    return lambda x: np.ascontiguousarray(x, np_dtype)


def answer_cast_from_str(name: str):
    """Parse an answer/stream dtype name -> (np_dtype, cast_fn); the one
    place the bf16/f32 aliases live (three trainers share it)."""
    import ml_dtypes

    if name in ("bfloat16", "bf16"):
        dt = ml_dtypes.bfloat16
    elif name in (None, "float32", "f32"):
        dt = np.float32
    else:
        raise ValueError(f"unknown answer dtype {name!r}")
    return dt, answer_cast(dt)
