"""Logging adapter.

Ref parity: `python/gigl/common/logger.py:12-74` — a Logger that adapts to the
runtime environment (the reference switches to Google Cloud Logging inside
GKE/GAE). Here: standard logging with a consistent format; hook point kept for
cloud handlers.
"""

from __future__ import annotations

import logging
import sys

_FORMAT = "%(asctime)s [%(levelname)s] %(name)s: %(message)s"
_configured = False


def get_logger(name: str = "gigl_tpu") -> logging.Logger:
    global _configured
    if not _configured:
        handler = logging.StreamHandler(sys.stderr)
        handler.setFormatter(logging.Formatter(_FORMAT))
        root = logging.getLogger("gigl_tpu")
        root.addHandler(handler)
        root.setLevel(logging.INFO)
        root.propagate = False
        _configured = True
    return logging.getLogger(name)
