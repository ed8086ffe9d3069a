"""Dense fanout-block neighborhood ops — the TPU-native sampled-batch core.

The key TPU design decision of this framework (SURVEY.md §7.4 "ragged degree
distributions on a dense-compute machine"): sampled neighborhoods are
**static-shape dense blocks** — a neighbor index matrix ``[N, K]`` plus a
validity mask — instead of ragged edge lists. Aggregation is then
gather → masked reduce over the K axis → matmul: every op is dense, every
shape static, everything tiles onto the MXU. This replaces both the
reference's precomputed ragged subgraph protos (v1) and GLT's live ragged
sampling (v2) on the device side.

All ops are jit-safe and differentiable.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

# Index used in neighbor matrices for "no neighbor" slots. Points at a valid
# row (0) so gathers stay in-bounds; the mask zeroes the contribution.
PAD_ID = 0


def gather_neighbors(
    x: jnp.ndarray, nbr_idx: jnp.ndarray
) -> jnp.ndarray:
    """x: [M, D] node features; nbr_idx: [N, K] → [N, K, D]."""
    return x[nbr_idx]


def masked_mean(
    nbr_feats: jnp.ndarray, mask: jnp.ndarray
) -> jnp.ndarray:
    """nbr_feats: [N, K, D]; mask: [N, K] bool → [N, D] mean over valid K."""
    m = mask.astype(nbr_feats.dtype)[..., None]
    s = jnp.sum(nbr_feats * m, axis=1)
    cnt = jnp.maximum(jnp.sum(m, axis=1), 1.0)
    return s / cnt


def masked_sum(nbr_feats: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    return jnp.sum(nbr_feats * mask.astype(nbr_feats.dtype)[..., None], axis=1)


def masked_max(nbr_feats: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    neg = jnp.finfo(nbr_feats.dtype).min
    out = jnp.max(jnp.where(mask[..., None], nbr_feats, neg), axis=1)
    # All-masked rows (isolated nodes) -> 0, matching segment_max behavior.
    any_valid = jnp.any(mask, axis=1, keepdims=True)
    return jnp.where(any_valid, out, 0.0)


def fanout_aggregate(
    x: jnp.ndarray,
    nbr_idx: jnp.ndarray,
    mask: jnp.ndarray,
    *,
    reduce: str = "mean",
    edge_weight: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Fused gather + masked reduce: out[n] = reduce_k x[nbr_idx[n, k]].

    x: [M, D]; nbr_idx/mask: [N, K] (+ optional edge_weight [N, K]) → [N, D].
    XLA fuses the gather with the reduction; the Pallas variant
    (a fused gather-reduce) additionally avoids the [N, K, D]
    HBM intermediate for large D.
    """
    feats = gather_neighbors(x, nbr_idx)
    if edge_weight is not None:
        feats = feats * edge_weight[..., None]
    if reduce == "mean":
        return masked_mean(feats, mask)
    if reduce == "sum":
        return masked_sum(feats, mask)
    if reduce == "max":
        return masked_max(feats, mask)
    raise ValueError(f"Unknown reduce {reduce!r}")


def masked_softmax(
    logits: jnp.ndarray, mask: jnp.ndarray, axis: int = -1
) -> jnp.ndarray:
    """Softmax over the K axis with invalid slots masked to zero weight.

    logits: [..., K]; mask: [..., K] bool. Rows with no valid slot return 0.
    """
    neg = jnp.finfo(logits.dtype).min
    masked = jnp.where(mask, logits, neg)
    m = jnp.max(masked, axis=axis, keepdims=True)
    e = jnp.exp(masked - jax.lax.stop_gradient(m)) * mask.astype(logits.dtype)
    denom = jnp.sum(e, axis=axis, keepdims=True)
    return e / jnp.maximum(denom, 1e-16)
