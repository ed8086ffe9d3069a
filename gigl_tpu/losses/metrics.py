"""Ranking evaluation metrics: Hits@K and Mean Reciprocal Rank.

Ref parity: `python/gigl/src/common/utils/eval_metrics.py` hit_rate_at_k (:6)
and mean_reciprocal_rank (:51); the NALP eval loop scores positives against
random negatives only and averages per rank before an all-reduce
(modeling_task_spec:534-560 — here the caller psums the (sum, count) pairs).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

Array = jnp.ndarray


def _ranks(pos_scores: Array, neg_scores: Array,
           neg_mask: Optional[Array] = None) -> Array:
    """Rank of each positive among [pos, negatives]: 1 = best.

    pos_scores: [Q]; neg_scores: [Q, N] (or [N] shared); ties count against
    the positive (pessimistic, matching torch `(neg >= pos).sum() + 1`).
    """
    if neg_scores.ndim == 1:
        neg_scores = jnp.broadcast_to(neg_scores[None, :],
                                      (pos_scores.shape[0], neg_scores.shape[0]))
    ge = neg_scores >= pos_scores[:, None]
    if neg_mask is not None:
        if neg_mask.ndim == 1:
            neg_mask = jnp.broadcast_to(neg_mask[None, :], ge.shape)
        ge = ge & neg_mask
    return jnp.sum(ge, axis=-1) + 1


def hits_at_k(
    pos_scores: Array,
    neg_scores: Array,
    ks: Sequence[int],
    *,
    pos_mask: Optional[Array] = None,
    neg_mask: Optional[Array] = None,
) -> Tuple[dict, Array]:
    """Returns ({k: hits_sum}, count): fraction computed by caller after psum."""
    ranks = _ranks(pos_scores, neg_scores, neg_mask)
    if pos_mask is None:
        pos_mask = jnp.ones(pos_scores.shape, bool)
    count = jnp.sum(pos_mask)
    out = {}
    for k in ks:
        out[int(k)] = jnp.sum(jnp.where(pos_mask, ranks <= k, False))
    return out, count


def mean_reciprocal_rank(
    pos_scores: Array,
    neg_scores: Array,
    *,
    pos_mask: Optional[Array] = None,
    neg_mask: Optional[Array] = None,
) -> Tuple[Array, Array]:
    """Returns (sum of 1/rank, count)."""
    ranks = _ranks(pos_scores, neg_scores, neg_mask)
    rr = 1.0 / ranks.astype(jnp.float32)
    if pos_mask is None:
        pos_mask = jnp.ones(pos_scores.shape, bool)
    return jnp.sum(jnp.where(pos_mask, rr, 0.0)), jnp.sum(pos_mask)


def accuracy(
    logits: Array, labels: Array, *, mask: Optional[Array] = None
) -> Tuple[Array, Array]:
    """(correct_sum, count) for node classification eval."""
    pred = jnp.argmax(logits, axis=-1)
    correct = pred == labels
    if mask is not None:
        return jnp.sum(jnp.where(mask, correct, False)), jnp.sum(mask)
    return jnp.sum(correct), jnp.asarray(labels.shape[0], jnp.int32)


class EvalMetric:
    """One named eval metric (ref `src/common/types/model_eval_metrics.py`
    EvalMetric.from_eval_metric_type: name + value)."""

    __slots__ = ("name", "value")

    def __init__(self, name: str, value: float):
        self.name = str(name)
        self.value = float(value)

    def __repr__(self):
        return f"EvalMetric({self.name}={self.value:.6g})"


class EvalMetricsCollection:
    """Named collection of eval metrics with KFP-metrics-JSON export.

    Ref parity: `src/common/types/model_eval_metrics.py`
    EvalMetricsCollection (metric map) and
    `translators/model_eval_metrics_translator.py` (flush to the KFP metrics
    JSON consumed by the pipeline UI, training_process.py:185-202).
    """

    def __init__(self, metrics: Optional[dict] = None):
        self.metrics: dict = {}
        for k, v in (metrics or {}).items():
            self.add(k, v)

    def add(self, name: str, value) -> None:
        self.metrics[str(name)] = EvalMetric(str(name), float(value))

    def __getitem__(self, name: str) -> float:
        return self.metrics[name].value

    def __contains__(self, name: str) -> bool:
        return name in self.metrics

    def to_dict(self) -> dict:
        return {k: m.value for k, m in self.metrics.items()}

    def to_kfp_metrics_json(self) -> str:
        """KFP UI metrics file format: {"metrics": [{name, numberValue}]}."""
        import json

        return json.dumps({"metrics": [
            {"name": k, "numberValue": m.value, "format": "RAW"}
            for k, m in sorted(self.metrics.items())]})

    @classmethod
    def from_dict(cls, d: dict) -> "EvalMetricsCollection":
        return cls(d)
