"""Training profiler wrapper around jax.profiler.

Ref parity: `modeling_task_specs/utils/profiler_wrapper.py:20-41`
TorchProfiler — wraps torch.profiler.profile with a tensorboard trace
handler writing to a local dir uploaded to remote storage after training
(`training_process.py:215-247`); enabled by ProfilerConfig in the task
config (`gbml_config.proto:221-229`).

TPU-native: jax.profiler writes TensorBoard-compatible traces (including
XLA/TPU device timelines); `upload` copies the trace dir to the configured
URI through the same UriFactory used for every artifact.
"""

from __future__ import annotations

import os
import tempfile
from dataclasses import dataclass
from typing import Optional

import jax

from gigl_tpu.utils.logger import get_logger

logger = get_logger(__name__)


@dataclass
class ProfilerConfig:
    """Mirrors the reference's ProfilerConfig (gbml_config.proto:221-229)."""

    should_enable_profiler: bool = False
    profiler_log_dir: Optional[str] = None  # remote URI for the trace


class TrainProfiler:
    """Context-managed jax.profiler trace with post-run upload."""

    def __init__(self, config: ProfilerConfig):
        self.cfg = config
        self._local_dir: Optional[str] = None
        self._active = False

    def __enter__(self) -> "TrainProfiler":
        if self.cfg.should_enable_profiler:
            self._local_dir = tempfile.mkdtemp(prefix="jax_trace_")
            jax.profiler.start_trace(self._local_dir)
            self._active = True
            logger.info("profiler trace started -> %s", self._local_dir)
        return self

    def __exit__(self, exc_type, exc, tb) -> None:
        if self._active:
            jax.profiler.stop_trace()
            self._active = False
            logger.info("profiler trace stopped")
            if self.cfg.profiler_log_dir:
                self.upload(self.cfg.profiler_log_dir)

    def step_marker(self, name: str):
        """Annotate a region in the trace (TraceAnnotation)."""
        return jax.profiler.TraceAnnotation(name)

    def upload(self, dest_uri: str) -> int:
        """Copy the local trace dir to dest_uri (ref: trace dir uploaded to
        GCS after training, training_process.py:215-247). Returns file
        count."""
        from gigl_tpu.data.uri import UriFactory

        if not self._local_dir:
            return 0
        count = 0
        for root, _dirs, files in os.walk(self._local_dir):
            for f in files:
                src = os.path.join(root, f)
                rel = os.path.relpath(src, self._local_dir)
                with open(src, "rb") as fh:
                    UriFactory.create(f"{dest_uri}/{rel}").write_bytes(
                        fh.read())
                count += 1
        logger.info("uploaded %d trace files to %s", count, dest_uri)
        return count
