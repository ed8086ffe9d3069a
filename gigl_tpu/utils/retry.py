"""Retry decorator with exponential backoff.

Ref parity: `python/gigl/common/utils/retry.py:23` — generic retry used for
flaky cloud operations.
"""

from __future__ import annotations

import functools
import time
from typing import Callable, Tuple, Type

from gigl_tpu.utils.logger import get_logger

logger = get_logger(__name__)


def retry(
    exceptions: Tuple[Type[BaseException], ...] = (Exception,),
    tries: int = 3,
    delay_s: float = 1.0,
    backoff: float = 2.0,
    max_delay_s: float = 60.0,
):
    def decorator(fn: Callable):
        @functools.wraps(fn)
        def wrapper(*args, **kwargs):
            attempt, wait = 0, delay_s
            while True:
                try:
                    return fn(*args, **kwargs)
                except exceptions as e:
                    attempt += 1
                    if attempt >= tries:
                        raise
                    logger.warning(
                        "retry %s/%s for %s after error: %s",
                        attempt, tries - 1, fn.__name__, e,
                    )
                    time.sleep(wait)
                    wait = min(wait * backoff, max_delay_s)

        return wrapper

    return decorator
