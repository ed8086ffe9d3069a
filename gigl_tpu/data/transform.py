"""Feature transformation: analyze-then-transform without Beam/TFT.

Ref parity: the Data Preprocessor's TFT stage
(`data_preprocessor.py:316-419`: per entity type, a Beam pipeline runs the
user ``preprocessing_fn`` under tensorflow-transform — analyzers (mean/var,
vocabulary) stream over the data, then the transform applies). SURVEY §7.4:
"TFT's analyze-then-transform must be reproduced without Beam — two-pass
stats job + pure-jnp transform fns."

Design: a ``TransformSpec`` maps output feature name -> ``TransformOp``; the
two phases are
  1. ``analyze(batches)`` — single streaming pass accumulating sufficient
     statistics (count/sum/sumsq/min/max, vocab counters);
  2. ``apply(batch)`` — vectorized NumPy transform using the frozen stats.
Stats serialize with the preprocessed metadata so training/inference reuse
the same transform (the reference persists the TFT transform_fn assets,
`ReadExistingTFTransformFn` lib/transform/utils.py).
"""

from __future__ import annotations

import io
import json
from collections import Counter
from dataclasses import dataclass, field
from typing import Callable, Dict, Iterable, List, Mapping, Optional, Sequence

import numpy as np


@dataclass
class FeatureStats:
    count: float = 0.0
    sum: float = 0.0
    sumsq: float = 0.0
    min: float = float("inf")
    max: float = float("-inf")
    vocab: Counter = field(default_factory=Counter)

    @property
    def mean(self) -> float:
        return self.sum / max(self.count, 1.0)

    @property
    def std(self) -> float:
        var = self.sumsq / max(self.count, 1.0) - self.mean**2
        return float(np.sqrt(max(var, 1e-12)))

    def to_dict(self) -> dict:
        return {
            "count": self.count, "sum": self.sum, "sumsq": self.sumsq,
            "min": self.min, "max": self.max,
            "vocab": dict(self.vocab),
        }

    @classmethod
    def from_dict(cls, d) -> "FeatureStats":
        s = cls(count=d["count"], sum=d["sum"], sumsq=d["sumsq"],
                min=d["min"], max=d["max"])
        s.vocab = Counter(d.get("vocab", {}))
        return s

    def merge(self, other: "FeatureStats") -> "FeatureStats":
        """Combine sufficient statistics from another shard — every
        accumulator here is mergeable (count/sum/sumsq additive, min/max
        associative, vocab counters additive), which is what makes the
        rank-sharded analyze pass (DataPreprocessor.run_analyze_shard)
        equivalent to the single-process one."""
        self.count += other.count
        self.sum += other.sum
        self.sumsq += other.sumsq
        self.min = min(self.min, other.min)
        self.max = max(self.max, other.max)
        self.vocab.update(other.vocab)
        return self


class TransformOp:
    """One output feature: how to transform an input column."""

    kind: str = "identity"

    def __init__(self, input_name: str):
        self.input_name = input_name

    def update(self, stats: FeatureStats, col: np.ndarray) -> None:
        col = np.asarray(col, dtype=np.float64).reshape(len(col), -1)
        stats.count += col.size
        stats.sum += float(col.sum())
        stats.sumsq += float((col**2).sum())
        stats.min = min(stats.min, float(col.min()) if col.size else stats.min)
        stats.max = max(stats.max, float(col.max()) if col.size else stats.max)

    def apply(self, stats: FeatureStats, col: np.ndarray) -> np.ndarray:
        raise NotImplementedError

    def out_dim(self, in_dim: int, stats: FeatureStats) -> int:
        return in_dim


class Identity(TransformOp):
    kind = "identity"

    def apply(self, stats, col):
        return np.asarray(col, np.float32).reshape(len(col), -1)


class ScaleToZScore(TransformOp):
    """tft.scale_to_z_score analog."""

    kind = "z_score"

    def apply(self, stats, col):
        col = np.asarray(col, np.float32).reshape(len(col), -1)
        return (col - stats.mean) / max(stats.std, 1e-12)


class ScaleTo01(TransformOp):
    """tft.scale_to_0_1 analog."""

    kind = "min_max"

    def apply(self, stats, col):
        col = np.asarray(col, np.float32).reshape(len(col), -1)
        rng = max(stats.max - stats.min, 1e-12)
        return (col - stats.min) / rng


class Log1p(TransformOp):
    kind = "log1p"

    def apply(self, stats, col):
        return np.log1p(np.maximum(
            np.asarray(col, np.float32).reshape(len(col), -1), 0.0))


class Vocabulary(TransformOp):
    """tft.compute_and_apply_vocabulary analog: frequency-ordered vocab,
    OOV -> num_oov_buckets hashed slots appended after the vocab."""

    kind = "vocab"

    def __init__(self, input_name: str, top_k: Optional[int] = None,
                 num_oov_buckets: int = 1):
        super().__init__(input_name)
        self.top_k = top_k
        self.num_oov_buckets = num_oov_buckets

    def update(self, stats, col):
        stats.count += len(col)
        stats.vocab.update(str(v) for v in np.asarray(col).reshape(-1))

    def _lookup(self, stats) -> Dict[str, int]:
        items = stats.vocab.most_common(self.top_k)
        return {tok: i for i, (tok, _) in enumerate(items)}

    def apply(self, stats, col):
        table = self._lookup(stats)
        V = len(table)
        out = np.empty(len(col), np.int64)
        for i, v in enumerate(np.asarray(col).reshape(-1)):
            tok = str(v)
            if tok in table:
                out[i] = table[tok]
            else:
                out[i] = V + (hash(tok) % self.num_oov_buckets)
        return out.reshape(-1, 1).astype(np.float32)

    def vocab_size(self, stats) -> int:
        return len(self._lookup(stats)) + self.num_oov_buckets

    def out_dim(self, in_dim, stats):
        return 1


class CustomFn(TransformOp):
    """User-defined transform — the escape hatch matching the reference's
    arbitrary ``preprocessing_fn`` (lib/data_preprocessor_config.py:27-55:
    users hand TFT any python transform; the built-in op set here must not
    be closed).

    ``fn`` is resolved by NAME through ``register_custom_transform`` or by
    dotted class path (``pkg.mod:fn`` / ``pkg.mod.fn``) — the reference's
    class-path pattern — so a saved TransformSpec reloads it. Signature:
    ``fn(stats: FeatureStats, col: np.ndarray) -> np.ndarray [N, D_out]``.
    Analyzer statistics (mean/std/min/max) are accumulated as usual, so a
    custom fn may standardize with them.
    """

    kind = "custom"

    def __init__(self, input_name: str, fn_name: str,
                 output_dim: Optional[int] = None):
        super().__init__(input_name)
        self.fn_name = fn_name
        self.output_dim = output_dim

    def _fn(self) -> Callable:
        if self.fn_name in _CUSTOM_FNS:
            return _CUSTOM_FNS[self.fn_name]
        from gigl_tpu.utils.registry import import_obj

        try:
            return import_obj(self.fn_name)
        except Exception as e:
            raise KeyError(
                f"custom transform {self.fn_name!r} is neither registered "
                f"(register_custom_transform) nor importable as a dotted "
                f"path") from e

    def apply(self, stats, col):
        out = np.asarray(self._fn()(stats, np.asarray(col)), np.float32)
        return out.reshape(len(col), -1)

    def out_dim(self, in_dim, stats):
        return self.output_dim if self.output_dim is not None else in_dim


_CUSTOM_FNS: Dict[str, Callable] = {}


def register_custom_transform(name: str, fn: Optional[Callable] = None):
    """Register (or use as a decorator) a named custom transform fn."""
    def _reg(f):
        _CUSTOM_FNS[name] = f
        return f

    return _reg if fn is None else _reg(fn)


_OP_KINDS = {c.kind: c for c in
             (Identity, ScaleToZScore, ScaleTo01, Log1p, Vocabulary)}


@dataclass
class TransformSpec:
    """output feature name -> TransformOp (the user preprocessing_fn analog,
    ref lib/data_preprocessor_config.py:58 build_ingestion_feature_spec_fn)."""

    ops: Dict[str, TransformOp]

    def analyze(self, batches: Iterable[Mapping[str, np.ndarray]]
                ) -> Dict[str, FeatureStats]:
        stats = {name: FeatureStats() for name in self.ops}
        for batch in batches:
            for name, op in self.ops.items():
                if op.input_name in batch:
                    op.update(stats[name], batch[op.input_name])
        return stats

    def apply(self, stats: Mapping[str, FeatureStats],
              batch: Mapping[str, np.ndarray]) -> np.ndarray:
        """Transform one batch into the concatenated [N, D] feature matrix
        (output order = sorted output names, deterministic)."""
        cols = []
        for name in sorted(self.ops):
            op = self.ops[name]
            cols.append(op.apply(stats[name], batch[op.input_name]))
        return np.concatenate(cols, axis=1).astype(np.float32)

    def out_dim(self, stats: Mapping[str, FeatureStats],
                in_dims: Mapping[str, int]) -> int:
        return sum(
            self.ops[name].out_dim(in_dims.get(self.ops[name].input_name, 1),
                                   stats[name])
            for name in sorted(self.ops))

    # -- persistence (transform-fn asset analog) ------------------------------
    def save_stats(self, stats: Mapping[str, FeatureStats], uri) -> None:
        from gigl_tpu.data.uri import UriFactory

        def op_spec(op):
            extra = {}
            if isinstance(op, Vocabulary):
                extra = {"top_k": op.top_k,
                         "num_oov_buckets": op.num_oov_buckets}
            elif isinstance(op, CustomFn):
                extra = {"fn_name": op.fn_name,
                         "output_dim": op.output_dim}
            return {"kind": op.kind, "input": op.input_name, **extra}

        payload = {
            "ops": {name: op_spec(op) for name, op in self.ops.items()},
            "stats": {name: s.to_dict() for name, s in stats.items()},
        }
        UriFactory.create(uri).write_text(json.dumps(payload))

    @classmethod
    def load_stats(cls, uri):
        from gigl_tpu.data.uri import UriFactory

        payload = json.loads(UriFactory.create(uri).read_text())
        ops = {}
        for name, spec in payload["ops"].items():
            kind = spec["kind"]
            if kind == "vocab":
                ops[name] = Vocabulary(spec["input"], top_k=spec.get("top_k"),
                                       num_oov_buckets=spec.get(
                                           "num_oov_buckets", 1))
            elif kind == "custom":
                ops[name] = CustomFn(spec["input"], spec["fn_name"],
                                     output_dim=spec.get("output_dim"))
            else:
                ops[name] = _OP_KINDS[kind](spec["input"])
        stats = {name: FeatureStats.from_dict(d)
                 for name, d in payload["stats"].items()}
        return cls(ops=ops), stats
