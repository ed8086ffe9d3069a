"""Training-scalar history logging (the TensorBoard-scalar analog).

Ref parity: the reference's opt-in TensorBoard scalar logging
(`gbml_config.proto:191` should_log_to_tensorboard;
`training/v1/lib/training_process.py:219-223` SummaryWriter scalars).
Here scalars stream to a JSON-lines file under any Uri (local/GCS) —
greppable, plottable, and free of a TensorBoard dependency; the metrics
publisher (utils/metrics.py) remains the ops-metrics plane.
"""

from __future__ import annotations

import json
import time
from typing import Optional

from gigl_tpu.data.uri import UriFactory


class ScalarLogger:
    """Append-buffered scalar history writer (JSONL)."""

    def __init__(self, uri, *, flush_every: int = 50):
        self._uri = UriFactory.create(uri)
        self._lines = []
        self._flush_every = flush_every
        self._t0 = time.time()

    def log(self, step: int, **scalars: float) -> None:
        rec = {"step": int(step),
               "wall_s": round(time.time() - self._t0, 3)}
        rec.update({k: float(v) for k, v in scalars.items()})
        self._lines.append(json.dumps(rec))
        if len(self._lines) >= self._flush_every:
            self.flush()

    def flush(self) -> None:
        if not self._lines:
            return
        existing = ""
        if self._uri.exists():
            existing = self._uri.read_text()
        self._uri.write_text(existing + "\n".join(self._lines) + "\n")
        self._lines = []

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.flush()
        return False
