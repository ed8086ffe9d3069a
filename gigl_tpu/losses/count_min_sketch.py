"""Count-min sketch for sampled-softmax candidate-probability estimation.

Ref parity: `python/gigl/src/common/models/layers/count_min_sketch.py:11`
(120 LoC) — the Retrieval task head estimates each candidate's sampling
probability as CMS_frequency / total_count and applies the logQ correction
(`layers/task.py:152-193`). This implementation is jnp-based and jittable so
the sketch can be updated on device inside the train step.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class CountMinSketch(NamedTuple):
    table: jnp.ndarray  # [depth, width] int32
    total: jnp.ndarray  # scalar int32

    @property
    def depth(self) -> int:
        return self.table.shape[0]

    @property
    def width(self) -> int:
        return self.table.shape[1]


def cms_init(depth: int = 5, width: int = 2048) -> CountMinSketch:
    return CountMinSketch(
        table=jnp.zeros((depth, width), jnp.int32),
        total=jnp.zeros((), jnp.int32),
    )


def _cms_hash(ids: jnp.ndarray, depth: int, width: int) -> jnp.ndarray:
    """Per-row hashed buckets: [depth, n] int32 in [0, width)."""
    rows = jnp.arange(depth, dtype=jnp.uint32)[:, None]
    x = ids.astype(jnp.uint32)[None, :] + rows * jnp.uint32(0x9E3779B9)
    x ^= x >> 16
    x *= jnp.uint32(0x7FEB352D)
    x ^= x >> 15
    x *= jnp.uint32(0x846CA68B)
    x ^= x >> 16
    return (x % jnp.uint32(width)).astype(jnp.int32)


def cms_add(sketch: CountMinSketch, ids: jnp.ndarray) -> CountMinSketch:
    """Add a batch of ids (each with count 1)."""
    ids = ids.reshape(-1)
    buckets = _cms_hash(ids, sketch.depth, sketch.width)  # [depth, n]
    ones = jnp.ones(ids.shape, jnp.int32)
    table = jax.vmap(
        lambda row, b: row.at[b].add(ones)
    )(sketch.table, buckets)
    return CountMinSketch(table=table, total=sketch.total + ids.shape[0])


def cms_estimate(sketch: CountMinSketch, ids: jnp.ndarray) -> jnp.ndarray:
    """Estimated counts (CMS min over rows): same shape as ids."""
    flat = ids.reshape(-1)
    buckets = _cms_hash(flat, sketch.depth, sketch.width)
    counts = jax.vmap(lambda row, b: row[b])(sketch.table, buckets)
    return jnp.min(counts, axis=0).reshape(ids.shape)


def cms_sampling_probability(
    sketch: CountMinSketch, ids: jnp.ndarray
) -> jnp.ndarray:
    """frequency / total — the candidate sampling probability used for the
    retrieval logQ correction (ref layers/task.py:152-193)."""
    est = cms_estimate(sketch, ids).astype(jnp.float32)
    total = jnp.maximum(sketch.total.astype(jnp.float32), 1.0)
    return est / total
