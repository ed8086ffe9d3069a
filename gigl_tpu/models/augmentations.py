"""Graph augmentations for contrastive SSL views.

Ref parity: `python/gigl/src/common/models/pyg/graph/augmentations.py` —
edge dropout and feature dropout used to build GRACE-style augmented views.

TPU-native form: augmentations act on the *sampled dense blocks* (the
hop-feature tensors + masks of the block tree), not on a global COO edge
list — dropping a neighbor slot's mask IS edge dropout in block form, and
zeroing feature columns is feature (dimension) dropout. Both are jit-safe.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp


def feature_dropout(
    rng: jax.Array, feats: jnp.ndarray, rate: float
) -> jnp.ndarray:
    """Zero whole feature dimensions with prob ``rate`` (GRACE 'feature
    masking': the same dims masked for every node in the view)."""
    if rate <= 0.0:
        return feats
    d = feats.shape[-1]
    keep = jax.random.bernoulli(rng, 1.0 - rate, (d,))
    return feats * keep.astype(feats.dtype)


def edge_dropout_masks(
    rng: jax.Array, masks: Sequence[jnp.ndarray], rate: float
) -> List[jnp.ndarray]:
    """Drop sampled neighbor slots with prob ``rate`` (edge dropout in
    dense-block form). masks[0] (the roots) is never dropped."""
    if rate <= 0.0:
        return list(masks)
    out = [masks[0]]
    for i, m in enumerate(masks[1:], start=1):
        rng, sub = jax.random.split(rng)
        keep = jax.random.bernoulli(sub, 1.0 - rate, m.shape)
        out.append(m & keep)
    return out


def augment_view(
    rng: jax.Array,
    hop_feats: Sequence[jnp.ndarray],
    masks: Sequence[jnp.ndarray],
    *,
    feature_drop_rate: float = 0.2,
    edge_drop_rate: float = 0.2,
) -> Tuple[List[jnp.ndarray], List[jnp.ndarray]]:
    """One augmented view of a sampled neighborhood: per-hop feature
    masking + neighbor-slot dropout (ref GRACE view construction,
    layers/task.py:212+)."""
    frng, erng = jax.random.split(rng)
    feats = []
    for i, f in enumerate(hop_feats):
        frng, sub = jax.random.split(frng)
        feats.append(feature_dropout(sub, f, feature_drop_rate))
    new_masks = edge_dropout_masks(erng, masks, edge_drop_rate)
    return feats, new_masks
