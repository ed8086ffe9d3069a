"""Built-in modeling task specs (trainer + inferencer in one class).

Ref parity: `python/gigl/src/common/modeling_task_specs/` —
NodeAnchorBasedLinkPredictionModelingTaskSpec (:66) and
NodeClassificationModelingTaskSpec (:47). Filled in by the training milestone;
this module is the canonical import target for trainer_cls_path defaults.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

from gigl_tpu.config.task_config import TaskConfig
from gigl_tpu.training.base import BaseInferencer, BaseTrainer


class NodeAnchorLinkPredictionTaskSpec(BaseTrainer, BaseInferencer):
    """Self-/un-supervised link prediction on anchor nodes (NALP).

    Placeholder shell — real loop lands with gigl_tpu.training.trainer.
    """

    def init_model(self, task_config: TaskConfig, state: Optional[Any] = None):
        raise NotImplementedError("NALP task spec training loop: in progress")

    def train(self, *args, **kwargs) -> Dict[str, float]:
        raise NotImplementedError

    def eval(self, *args, **kwargs) -> Dict[str, float]:
        raise NotImplementedError

    def infer_batch(self, batch: Any) -> Any:
        raise NotImplementedError


class NodeClassificationTaskSpec(BaseTrainer, BaseInferencer):
    """Supervised node classification task spec (placeholder shell)."""

    def init_model(self, task_config: TaskConfig, state: Optional[Any] = None):
        raise NotImplementedError

    def train(self, *args, **kwargs) -> Dict[str, float]:
        raise NotImplementedError

    def eval(self, *args, **kwargs) -> Dict[str, float]:
        raise NotImplementedError

    def infer_batch(self, batch: Any) -> Any:
        raise NotImplementedError
