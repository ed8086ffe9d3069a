"""Early stopping on a validation metric.

Ref parity: `python/gigl/src/common/modeling_task_specs/utils/early_stop.py:12`
EarlyStopper — patience-based, tracks best metric (greater- or less-is-better),
holds a snapshot of the best params.
"""

from __future__ import annotations

from typing import Any, Optional


class EarlyStopper:
    def __init__(self, patience: int = 5, greater_is_better: bool = True,
                 min_delta: float = 0.0):
        self.patience = patience
        self.greater_is_better = greater_is_better
        self.min_delta = min_delta
        self.best_value: Optional[float] = None
        self.best_state: Any = None
        self.num_bad_evals = 0

    def update(self, value: float, state: Any = None) -> bool:
        """Record an eval result; returns True if training should stop."""
        improved = (
            self.best_value is None
            or (self.greater_is_better and value > self.best_value + self.min_delta)
            or (not self.greater_is_better and value < self.best_value - self.min_delta)
        )
        if improved:
            self.best_value = value
            self.best_state = state
            self.num_bad_evals = 0
            return False
        self.num_bad_evals += 1
        return self.num_bad_evals >= self.patience
