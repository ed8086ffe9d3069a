"""Segment-based sparse aggregation ops (XLA path).

The COO/CSR compute core for full-graph message passing: gather source-node
features per edge, reduce into destination segments. These are the XLA
baselines the fused/quantized gather paths (gigl_tpu.ops.quantized) are benchmarked
against (SURVEY.md §7.2 step 4: "Benchmark vs XLA segment_sum baselines").

All ops take **static** ``num_segments`` — required for jit/TPU.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp


def segment_sum(
    data: jnp.ndarray, segment_ids: jnp.ndarray, num_segments: int
) -> jnp.ndarray:
    return jax.ops.segment_sum(
        data, segment_ids, num_segments=num_segments, indices_are_sorted=False
    )


def segment_mean(
    data: jnp.ndarray, segment_ids: jnp.ndarray, num_segments: int
) -> jnp.ndarray:
    s = segment_sum(data, segment_ids, num_segments)
    counts = jax.ops.segment_sum(
        jnp.ones((data.shape[0],), dtype=data.dtype),
        segment_ids,
        num_segments=num_segments,
    )
    counts = jnp.maximum(counts, 1)
    return s / counts.reshape((-1,) + (1,) * (data.ndim - 1))


def segment_max(
    data: jnp.ndarray, segment_ids: jnp.ndarray, num_segments: int
) -> jnp.ndarray:
    out = jax.ops.segment_max(data, segment_ids, num_segments=num_segments)
    # Empty segments come back as -inf; zero them (parity with mean/sum on
    # isolated nodes — the reference gives isolated nodes self-loops instead,
    # SGSPureSparkV1Task.scala:847).
    return jnp.where(jnp.isfinite(out), out, 0.0)


def segment_softmax(
    logits: jnp.ndarray, segment_ids: jnp.ndarray, num_segments: int
) -> jnp.ndarray:
    """Numerically-stable softmax within each segment (attention over
    in-neighborhoods — used by GAT-family models on the full-graph path)."""
    seg_max = jax.ops.segment_max(logits, segment_ids, num_segments=num_segments)
    seg_max = jnp.where(jnp.isfinite(seg_max), seg_max, 0.0)
    shifted = logits - seg_max[segment_ids]
    exp = jnp.exp(shifted)
    denom = jax.ops.segment_sum(exp, segment_ids, num_segments=num_segments)
    return exp / jnp.maximum(denom[segment_ids], 1e-16)


def coo_spmm(
    src: jnp.ndarray,
    dst: jnp.ndarray,
    x: jnp.ndarray,
    num_dst: int,
    *,
    edge_weight: Optional[jnp.ndarray] = None,
    reduce: str = "sum",
) -> jnp.ndarray:
    """Sparse A @ X over COO edges: out[d] = reduce_{(s,d) in E} w * x[s].

    The full-graph aggregation primitive (the "SpMM aggregate" of the
    north-star metric, BASELINE.md). XLA lowers this to gather + scatter-add.
    """
    msgs = x[src]
    if edge_weight is not None:
        msgs = msgs * edge_weight.reshape((-1,) + (1,) * (x.ndim - 1))
    if reduce == "sum":
        return segment_sum(msgs, dst, num_dst)
    if reduce == "mean":
        return segment_mean(msgs, dst, num_dst)
    if reduce == "max":
        return segment_max(msgs, dst, num_dst)
    raise ValueError(f"Unknown reduce {reduce!r}")


def sddmm(
    src: jnp.ndarray,
    dst: jnp.ndarray,
    q: jnp.ndarray,
    k: jnp.ndarray,
) -> jnp.ndarray:
    """Sampled dense-dense matmul: per-edge score <q[dst_e], k[src_e]>.

    Attention-score primitive for GAT/Transformer convs on the COO path.
    q: [N_dst, H, D] or [N_dst, D]; k likewise; returns [E, H] or [E].
    """
    qe = q[dst]
    ke = k[src]
    return jnp.sum(qe * ke, axis=-1)
