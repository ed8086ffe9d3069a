"""Dynamic class-path imports — the user-plugin injection mechanism.

Ref parity: `python/gigl/common/utils/os_utils.py import_obj`, used throughout
the reference to load user code from config strings (trainerClsPath,
inferencerClsPath, dataPreprocessorConfigClsPath, ... —
training_process.py:122-139).
"""

from __future__ import annotations

import importlib
from typing import Any


def import_obj(cls_path: str) -> Any:
    """Import ``pkg.module.Object`` and return the object."""
    if not cls_path or "." not in cls_path:
        raise ValueError(f"Invalid class path: {cls_path!r}")
    module_path, obj_name = cls_path.rsplit(".", 1)
    module = importlib.import_module(module_path)
    try:
        return getattr(module, obj_name)
    except AttributeError as e:
        raise ImportError(f"{obj_name!r} not found in {module_path!r}") from e


def instantiate_from_cls_path(cls_path: str, /, **kwargs) -> Any:
    """Import and instantiate with kwargs (reference passes *Args string maps)."""
    return import_obj(cls_path)(**kwargs)
