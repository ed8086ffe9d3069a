"""User-facing training/inference plugin interfaces.

Ref parity: `python/gigl/src/training/v1/lib/base_trainer.py:16-36` BaseTrainer
ABC (init_model / setup_for_training / train / eval) and
`python/gigl/src/inference/v1/lib/base_inferencer.py:29-66` BaseInferencer
(infer_batch). Task specs (gigl_tpu.training.task_specs) implement both, the
same dual role the reference's modeling task specs play
(SURVEY.md §2.3 "each implements both BaseTrainer and BaseInferencer").
"""

from __future__ import annotations

import abc
from typing import Any, Dict, Optional

from gigl_tpu.config.task_config import TaskConfig


class BaseTrainer(abc.ABC):
    """Training plugin, dynamically imported from trainer_cls_path."""

    def __init__(self, **kwargs: Any):
        # Reference passes trainerArgs as a string map; subclasses parse.
        self.kwargs = kwargs

    @abc.abstractmethod
    def init_model(self, task_config: TaskConfig, state: Optional[Any] = None):
        """Build model params/state (optionally warm-started from ``state``)."""

    def setup_for_training(self) -> None:
        """Hook before the train loop (ref BaseTrainer.setup_for_training)."""

    @abc.abstractmethod
    def train(self, *args, **kwargs) -> Dict[str, float]:
        """Run training; returns final train metrics."""

    @abc.abstractmethod
    def eval(self, *args, **kwargs) -> Dict[str, float]:
        """Run evaluation; returns eval metrics (e.g. mrr, hits@k, loss)."""


class BaseInferencer(abc.ABC):
    """Inference plugin, dynamically imported from inferencer_cls_path."""

    @abc.abstractmethod
    def infer_batch(self, batch: Any) -> Any:
        """Produce embeddings and/or predictions for one batch."""
