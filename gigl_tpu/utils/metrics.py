"""Ops-metrics publishing interface + component timers.

Ref parity: `python/gigl/common/metrics/metrics_interface.py:4`
OpsMetricPublisher ABC with a no-op default and a pluggable
`metricsClsPath` (`gbml_config.proto:220-223`,
`src/common/utils/metrics_service_provider.py:18-45`), and the
`@profileit` coarse-grained component timers
(`common/metrics/decorators.py:12+`).
"""

from __future__ import annotations

import abc
import time
from collections import defaultdict
from functools import wraps
from typing import Any, Callable, Dict, Optional

from gigl_tpu.utils.logger import get_logger
from gigl_tpu.utils.registry import import_obj

logger = get_logger(__name__)


class OpsMetricPublisher(abc.ABC):
    """Publish counters/gauges/timers to an ops backend."""

    @abc.abstractmethod
    def add_count(self, name: str, value: int = 1, **tags) -> None: ...

    @abc.abstractmethod
    def add_gauge(self, name: str, value: float, **tags) -> None: ...

    @abc.abstractmethod
    def add_timer(self, name: str, seconds: float, **tags) -> None: ...

    def flush(self) -> None:  # optional
        pass


class NopMetricsPublisher(OpsMetricPublisher):
    """Default no-op publisher (ref base_metrics.py:4)."""

    def add_count(self, name, value=1, **tags):
        pass

    def add_gauge(self, name, value, **tags):
        pass

    def add_timer(self, name, seconds, **tags):
        pass


class InMemoryMetricsPublisher(OpsMetricPublisher):
    """Collects metrics in process (tests / local runs)."""

    def __init__(self):
        self.counts: Dict[str, int] = defaultdict(int)
        self.gauges: Dict[str, float] = {}
        self.timers: Dict[str, list] = defaultdict(list)

    def add_count(self, name, value=1, **tags):
        self.counts[name] += value

    def add_gauge(self, name, value, **tags):
        self.gauges[name] = float(value)

    def add_timer(self, name, seconds, **tags):
        self.timers[name].append(float(seconds))


_publisher: OpsMetricPublisher = NopMetricsPublisher()


def initialize_metrics(metrics_cls_path: Optional[str] = None,
                       **kwargs) -> OpsMetricPublisher:
    """Install the process-wide publisher from a class path (ref
    metrics_service_provider.initialize_metrics + import by
    `metricsClsPath`)."""
    global _publisher
    if metrics_cls_path:
        _publisher = import_obj(metrics_cls_path)(**kwargs)
    else:
        _publisher = NopMetricsPublisher()
    return _publisher


def get_metrics_publisher() -> OpsMetricPublisher:
    return _publisher


def set_metrics_publisher(p: OpsMetricPublisher) -> None:
    global _publisher
    _publisher = p


def profileit(name: Optional[str] = None) -> Callable:
    """Time a function and publish `<name>` as a timer (ref
    common/metrics/decorators.py @profileit)."""

    def deco(fn: Callable) -> Callable:
        metric = name or f"timer_{fn.__name__}"

        @wraps(fn)
        def wrapper(*args, **kwargs):
            t0 = time.perf_counter()
            try:
                return fn(*args, **kwargs)
            finally:
                dt = time.perf_counter() - t0
                _publisher.add_timer(metric, dt)
                logger.debug("%s took %.3fs", metric, dt)

        return wrapper

    return deco
