"""Self-supervised task heads (the reference's task zoo).

Ref parity: `python/gigl/src/common/models/layers/task.py` —
NodeAnchorBasedLinkPredictionBaseTask ABC (:41) and the SSL family:
GRACE (:212), FeatureReconstruction (:282), WhiteningDecorrelation (:351),
GBT (:421), BGRL (:483), TBGRL (:563), DirectAU (:656), plus the
multi-task container NodeAnchorBasedLinkPredictionTasks (:699).

Each head is a flax module owning its projector/predictor parameters and
exposing ``loss(...)`` over encoder outputs for two augmented views (plus
raw features where needed). The losses themselves come from
gigl_tpu.losses.losses (numerics parity with layers/loss.py). BGRL/TBGRL
maintain an EMA *target* parameter copy — carried explicitly by the caller
(functional JAX state), with ``ema_update`` provided here.

The container weights and sums task losses, mirroring the reference's
multi-task calculate_losses (:699-758).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from gigl_tpu.losses.losses import (
    alignment_loss,
    bgrl_loss,
    feature_reconstruction_loss,
    gbt_loss,
    grace_loss,
    tbgrl_loss,
    uniformity_loss,
    whitening_decorrelation_loss,
)


class _Projector(nn.Module):
    """2-layer MLP projector (the standard contrastive projection head)."""

    hidden_dim: int
    out_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden_dim, dtype=self.dtype, name="fc1")(x)
        x = jax.nn.elu(x)
        return nn.Dense(self.out_dim, dtype=self.dtype, name="fc2")(x)


class GraceTask(nn.Module):
    """GRACE contrastive head (ref task.py:212): project both views, InfoNCE
    between them with temperature."""

    hidden_dim: int = 128
    out_dim: int = 64
    temperature: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z1: jnp.ndarray, z2: jnp.ndarray) -> jnp.ndarray:
        proj = _Projector(self.hidden_dim, self.out_dim, self.dtype,
                          name="proj")
        return grace_loss(proj(z1), proj(z2), temperature=self.temperature)


class WhiteningDecorrelationTask(nn.Module):
    """W-MSE-style whitening decorrelation (ref task.py:351)."""

    hidden_dim: int = 128
    out_dim: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z1, z2):
        proj = _Projector(self.hidden_dim, self.out_dim, self.dtype,
                          name="proj")
        return whitening_decorrelation_loss(proj(z1), proj(z2))


class GBTTask(nn.Module):
    """Graph Barlow Twins (ref task.py:421): cross-correlation identity."""

    @nn.compact
    def __call__(self, z1, z2):
        return gbt_loss(z1, z2)


class FeatureReconstructionTask(nn.Module):
    """Masked-feature reconstruction (ref task.py:282): decode embeddings
    back to input features, scaled-cosine error."""

    feature_dim: int = 0
    hidden_dim: int = 128
    gamma: float = 2.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
        h = nn.Dense(self.hidden_dim, dtype=self.dtype, name="dec1")(z)
        h = jax.nn.relu(h)
        x_hat = nn.Dense(x.shape[-1], dtype=self.dtype, name="dec2")(h)
        return feature_reconstruction_loss(x_hat, x, gamma=self.gamma)


class BGRLTask(nn.Module):
    """BGRL predictor head (ref task.py:483): online view predicts the EMA
    target view's embedding; symmetric cosine loss. The target embeddings
    are produced by the caller with the EMA parameter copy."""

    hidden_dim: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, online_z1, online_z2, target_z1, target_z2):
        pred = _Projector(self.hidden_dim, online_z1.shape[-1], self.dtype,
                          name="predictor")
        p1, p2 = pred(online_z1), pred(online_z2)
        return bgrl_loss(p1, jax.lax.stop_gradient(target_z2)) + bgrl_loss(
            p2, jax.lax.stop_gradient(target_z1))


class TBGRLTask(nn.Module):
    """Triple-BGRL (ref task.py:563): BGRL plus a corrupted negative view
    pushed away."""

    hidden_dim: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, online_z1, online_z2, target_z1, target_z2, neg_z):
        pred = _Projector(self.hidden_dim, online_z1.shape[-1], self.dtype,
                          name="predictor")
        p1, p2 = pred(online_z1), pred(online_z2)
        neg = jax.lax.stop_gradient(neg_z)
        return (tbgrl_loss(p1, jax.lax.stop_gradient(target_z2), neg)
                + tbgrl_loss(p2, jax.lax.stop_gradient(target_z1), neg))


class DirectAUTask(nn.Module):
    """DirectAU (ref task.py:656): alignment of positive pairs +
    uniformity of each view's embedding distribution."""

    gamma: float = 1.0

    @nn.compact
    def __call__(self, q: jnp.ndarray, pos: jnp.ndarray) -> jnp.ndarray:
        a = alignment_loss(q, pos)
        u = 0.5 * (uniformity_loss(q) + uniformity_loss(pos))
        return a + self.gamma * u


def ema_update(target_params, online_params, decay: float):
    """BGRL target-network EMA step (ref task.py:483+ update_target)."""
    return jax.tree_util.tree_map(
        lambda t, o: decay * t + (1.0 - decay) * o, target_params,
        online_params)


@dataclass
class WeightedTask:
    """One entry of the multi-task container."""

    name: str
    module: nn.Module
    weight: float = 1.0
    # Which inputs this task's __call__ wants, resolved from the kwargs
    # given to MultiTaskSSL.loss (e.g. ("z1", "z2") or ("z", "x")).
    inputs: Tuple[str, ...] = ("z1", "z2")


class MultiTaskSSL:
    """Weighted sum of SSL task losses (ref multi-task container
    NodeAnchorBasedLinkPredictionTasks, task.py:699-758).

    Functional: ``init`` builds per-task params; ``loss`` evaluates the
    weighted sum given named embedding tensors.
    """

    def __init__(self, tasks: Sequence[WeightedTask]):
        names = [t.name for t in tasks]
        if len(set(names)) != len(names):
            raise ValueError(f"duplicate task names: {names}")
        self.tasks = list(tasks)

    def init(self, rng: jax.Array, **tensors) -> Dict[str, Any]:
        params = {}
        for t in self.tasks:
            rng, sub = jax.random.split(rng)
            args = [tensors[k] for k in t.inputs]
            params[t.name] = t.module.init(sub, *args)
        return params

    def loss(self, params: Dict[str, Any], **tensors
             ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        total = jnp.zeros((), jnp.float32)
        per_task = {}
        for t in self.tasks:
            args = [tensors[k] for k in t.inputs]
            l = t.module.apply(params[t.name], *args)
            l = jnp.asarray(l, jnp.float32)
            per_task[t.name] = l
            total = total + t.weight * l
        return total, per_task
