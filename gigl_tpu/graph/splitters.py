"""Deterministic train/val/test splitters.

Two generations of split semantics from the reference, both reproduced:

1. **Node-anchor hash split** (v2/GLT semantics — ref:
   python/gigl/utils/data_splitters.py:90-260 HashedNodeAnchorLinkSplitter):
   anchor nodes of supervision edges are deduped and ordered by an integer
   mixing hash; first `1 - val - test` fraction is train, then val, then test.
   A node lives in exactly one split.

2. **Transductive edge hash split** (v1 Split Generator semantics — ref:
   scala/split_generator/.../TransductiveNodeAnchorBasedLinkPredictionSplitStrategy.scala
   and AbstractAssigners.scala:30-50): every edge is deterministically
   bucketed over a granular hash space into (dataset_split, edge_usage)
   where usage ∈ {MESSAGE, SUPERVISION, MESSAGE_AND_SUPERVISION}; per-split
   visibility rules are in Appendix A.1 of SURVEY.md.

Both are NumPy host-side (split assignment happens once per dataset build).
"""

from __future__ import annotations

import enum
from dataclasses import dataclass
from typing import Dict, Mapping, Optional, Sequence, Tuple, Union

import numpy as np

from gigl_tpu.types.graph import (
    DEFAULT_HOMOGENEOUS_EDGE_TYPE,
    DEFAULT_HOMOGENEOUS_NODE_TYPE,
    EdgeType,
    NodeType,
)


def fast_hash(x: np.ndarray) -> np.ndarray:
    """Integer mixing hash (splitmix64/lowbias32-style finalizers).

    Behavior-parity with the reference's `_fast_hash`
    (python/gigl/utils/data_splitters.py:53-88): int32 inputs use the 32-bit
    lowbias finalizer, int64 the splitmix64 finalizer; fast_hash(0) == 0.
    Implemented on unsigned views so overflow wraps as in C.
    """
    x = np.asarray(x)
    # Shifts are applied on the SIGNED view (arithmetic shift — matching the
    # reference's torch semantics on signed tensors), multiplies on the
    # unsigned view (wrapping like C).
    if x.dtype in (np.int32, np.uint32):
        v = x.astype(np.int32).copy()
        v ^= v >> 16
        v = (v.view(np.uint32) * np.uint32(0x7FEB352D)).view(np.int32)
        v ^= v >> 15
        v = (v.view(np.uint32) * np.uint32(0x846CA68B)).view(np.int32)
        v ^= v >> 16
        return v
    elif x.dtype in (np.int64, np.uint64):
        v = x.astype(np.int64).copy()
        v ^= v >> 30
        v = (v.view(np.uint64) * np.uint64(0xBF58476D1CE4E5B9)).view(np.int64)
        v ^= v >> 27
        v = (v.view(np.uint64) * np.uint64(0x94D049BB133111EB)).view(np.int64)
        v ^= v >> 31
        return v
    raise ValueError(f"Unsupported dtype {x.dtype}")


class HashedNodeAnchorLinkSplitter:
    """Split anchor nodes of supervision edges into train/val/test.

    Semantics parity with ref data_splitters.py:90-260 (see module docstring):
    the *order* of the hash-argsort determines splits, and the torch argsort
    there is over signed hash values — we match that by argsorting the signed
    view, so splits agree with the reference for identical inputs.
    """

    def __init__(
        self,
        sampling_direction: str = "in",
        num_val: Union[float, int] = 0.1,
        num_test: Union[float, int] = 0.1,
        supervision_edge_types: Optional[Sequence[EdgeType]] = None,
    ):
        if sampling_direction not in ("in", "out"):
            raise ValueError(f"Invalid sampling direction {sampling_direction!r}")
        for v in (num_val, num_test):
            if isinstance(v, float) and not (0 < v < 1):
                raise ValueError(f"fractional num_val/num_test must be in (0,1): {v}")
            if isinstance(v, int) and isinstance(num_val, int) and v < 0:
                raise ValueError(f"num_val/num_test must be >= 0: {v}")
        self._direction = sampling_direction
        self._num_val = num_val
        self._num_test = num_test
        self._edge_types = (
            list(supervision_edge_types)
            if supervision_edge_types
            else [DEFAULT_HOMOGENEOUS_EDGE_TYPE]
        )

    def __call__(
        self,
        edge_index: Union[np.ndarray, Mapping[EdgeType, np.ndarray]],
    ) -> Union[
        Tuple[np.ndarray, np.ndarray, np.ndarray],
        Dict[NodeType, Tuple[np.ndarray, np.ndarray, np.ndarray]],
    ]:
        heterogeneous = not isinstance(edge_index, np.ndarray)
        if not heterogeneous:
            edge_index = {DEFAULT_HOMOGENEOUS_EDGE_TYPE: edge_index}
        else:
            missing = set(self._edge_types) - set(edge_index.keys())
            if missing:
                raise ValueError(f"Missing supervision edge types: {missing}")

        # Collect anchor node ids per anchor node type across supervision
        # edge types (a node type can be anchored by several edge types).
        anchors_by_type: Dict[NodeType, list] = {}
        for et in self._edge_types:
            coo = np.asarray(edge_index[et])
            if coo.ndim != 2 or coo.shape[0] != 2:
                raise ValueError(f"edge index for {et} must be [2, E]")
            anchor_row = coo[1] if self._direction == "in" else coo[0]
            anchor_nt = (
                et.dst_node_type if self._direction == "in" else et.src_node_type
            )
            anchors_by_type.setdefault(anchor_nt, []).append(anchor_row)

        out: Dict[NodeType, Tuple[np.ndarray, np.ndarray, np.ndarray]] = {}
        for nt, rows in anchors_by_type.items():
            ids = np.unique(np.concatenate(rows))
            order = np.argsort(fast_hash(ids.astype(np.int64)), kind="stable")
            ids = ids[order]
            n = len(ids)
            num_val = (
                self._num_val
                if isinstance(self._num_val, int)
                else int(n * self._num_val)
            )
            num_test = (
                self._num_test
                if isinstance(self._num_test, int)
                else int(n * self._num_test)
            )
            num_train = n - num_val - num_test
            if num_train <= 0:
                raise ValueError(
                    f"No training nodes left for {nt!r}: n={n}, "
                    f"val={num_val}, test={num_test}"
                )
            out[nt] = (
                ids[:num_train],
                ids[num_train: num_train + num_val],
                ids[num_train + num_val:],
            )
        if heterogeneous:
            return out
        return out[DEFAULT_HOMOGENEOUS_NODE_TYPE]


class DatasetSplit(enum.IntEnum):
    TRAIN = 0
    VAL = 1
    TEST = 2


class EdgeUsage(enum.IntEnum):
    """Ref parity: scala/split_generator lib/Types.scala:6-25 LinkUsage."""

    MESSAGE = 0
    SUPERVISION = 1
    MESSAGE_AND_SUPERVISION = 2


# The reference assigner buckets over a 10000-granule hash space
# (AbstractAssigners.scala:30-50).
_HASH_GRANULARITY = 10_000


@dataclass
class EdgeSplitAssignment:
    """Per-edge (split, usage) assignment for one edge type."""

    split: np.ndarray  # [E] int8, DatasetSplit values
    usage: np.ndarray  # [E] int8, EdgeUsage values

    def message_mask(self, out_split: DatasetSplit, is_disjoint: bool) -> np.ndarray:
        """Which edges are visible for message passing when producing samples
        of ``out_split``. Exact rules from SURVEY Appendix A.1:

        - TRAIN sample: TRAIN-assigned edges only; in disjoint mode only
          usage == MESSAGE.
        - VAL sample: TRAIN-assigned edges only.
        - TEST sample: TRAIN- or VAL-assigned edges.
        - TEST-assigned edges are never message-passing anywhere.
        """
        if out_split == DatasetSplit.TRAIN:
            m = self.split == DatasetSplit.TRAIN
            if is_disjoint:
                m &= self.usage == EdgeUsage.MESSAGE
            return m
        if out_split == DatasetSplit.VAL:
            return self.split == DatasetSplit.TRAIN
        return (self.split == DatasetSplit.TRAIN) | (self.split == DatasetSplit.VAL)

    def supervision_mask(self, out_split: DatasetSplit) -> np.ndarray:
        """Supervision edges of ``out_split``: assigned to that split, except
        TRAIN MESSAGE-usage edges are never supervision
        (ref shouldAddSupervisionEdgeToSplit:253-267)."""
        m = self.split == np.int8(out_split)
        if out_split == DatasetSplit.TRAIN:
            m &= self.usage != EdgeUsage.MESSAGE
        return m


class TransductiveEdgeSplitter:
    """Assign every edge a (DatasetSplit, EdgeUsage) deterministically.

    Semantics parity with the reference's
    TransductiveEdgeToLinkSplitHashingAssigner: hash each edge (with the
    seed) into buckets; the first `train_ratio` of bucket space is TRAIN,
    then VAL, then TEST. Within TRAIN, in disjoint mode a
    `supervision_ratio` sub-fraction is SUPERVISION, the rest MESSAGE;
    otherwise usage is MESSAGE_AND_SUPERVISION. VAL/TEST edges are always
    SUPERVISION-capable (usage MESSAGE_AND_SUPERVISION so they can serve as
    message edges for later splits per the A.1 visibility rules).
    """

    def __init__(
        self,
        train_ratio: float = 0.8,
        val_ratio: float = 0.1,
        seed: int = 42,
        is_disjoint_mode: bool = False,
        supervision_ratio: float = 0.5,
    ):
        if not (0 < train_ratio < 1 and 0 <= val_ratio < 1):
            raise ValueError("bad ratios")
        if train_ratio + val_ratio >= 1.0:
            raise ValueError("train + val must leave room for test")
        self.train_ratio = train_ratio
        self.val_ratio = val_ratio
        self.seed = seed
        self.is_disjoint_mode = is_disjoint_mode
        self.supervision_ratio = supervision_ratio

    def _bucket(self, src: np.ndarray, dst: np.ndarray, salt: int) -> np.ndarray:
        # Mix (src, dst, seed, salt) into [0, granularity). Uses splitmix64
        # composition; deterministic across runs/platforms.
        mixed = (
            src.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
            + dst.astype(np.uint64)
            + np.uint64((self.seed * 1_000_003 + salt) & 0xFFFFFFFFFFFFFFFF)
        ).view(np.int64)
        h = fast_hash(mixed)
        return (h.view(np.uint64) % np.uint64(_HASH_GRANULARITY)).astype(np.int64)

    def __call__(self, src: np.ndarray, dst: np.ndarray) -> EdgeSplitAssignment:
        src = np.asarray(src)
        dst = np.asarray(dst)
        b = self._bucket(src, dst, salt=0)
        train_hi = int(self.train_ratio * _HASH_GRANULARITY)
        val_hi = train_hi + int(self.val_ratio * _HASH_GRANULARITY)
        split = np.where(
            b < train_hi,
            np.int8(DatasetSplit.TRAIN),
            np.where(b < val_hi, np.int8(DatasetSplit.VAL), np.int8(DatasetSplit.TEST)),
        )
        usage = np.full(len(b), np.int8(EdgeUsage.MESSAGE_AND_SUPERVISION))
        if self.is_disjoint_mode:
            b2 = self._bucket(src, dst, salt=1)
            sup_hi = int(self.supervision_ratio * _HASH_GRANULARITY)
            train_m = split == DatasetSplit.TRAIN
            usage = np.where(
                train_m & (b2 < sup_hi),
                np.int8(EdgeUsage.SUPERVISION),
                np.where(train_m, np.int8(EdgeUsage.MESSAGE), usage),
            )
        return EdgeSplitAssignment(split=split, usage=usage)


def _ratio_buckets(train_ratio: float, val_ratio: float) -> Tuple[int, int]:
    """Ratio-weighted bucket boundaries over the granular hash space
    (ref HashingAssigner bucketWeights, AbstractAssigners.scala:30-50)."""
    if not (0 < train_ratio < 1 and 0 <= val_ratio < 1):
        raise ValueError("bad ratios")
    if train_ratio + val_ratio > 1.0:
        raise ValueError("train + val ratios exceed 1")
    train_hi = int(train_ratio * _HASH_GRANULARITY)
    val_hi = train_hi + int(val_ratio * _HASH_GRANULARITY)
    return train_hi, val_hi


def _buckets_to_split(b: np.ndarray, train_hi: int, val_hi: int) -> np.ndarray:
    return np.where(
        b < train_hi,
        np.int8(DatasetSplit.TRAIN),
        np.where(b < val_hi, np.int8(DatasetSplit.VAL),
                 np.int8(DatasetSplit.TEST)),
    )


class NodeSplitAssigner:
    """Assign every node id a DatasetSplit by deterministic hash bucketing.

    Ref parity: NodeToDatasetSplitHashingAssigner
    (scala/split_generator/.../assigners/NodeToDatasetSplitHashingAssigner.scala)
    — node uniqueId hashed into ratio-weighted {TRAIN, VAL, TEST} buckets over
    the 10000-granule space. Used by both node-classification split
    strategies:

    - **Transductive** (TransductiveSupervisedNodeClassificationSplitStrategy):
      only the labeled *root nodes* are split; every split's samples see the
      entire message-passing graph.
    - **Inductive** (InductiveSupervisedNodeClassificationSplitStrategy):
      train/val/test graphs are disjoint — a sample of split S keeps only
      nodes assigned to S and edges whose BOTH endpoints are assigned to S
      (`pruneOutsideNodesAndEdges`). Use :func:`inductive_message_mask`.
    """

    def __init__(self, train_ratio: float = 0.8, val_ratio: float = 0.1,
                 seed: int = 42):
        self.train_hi, self.val_hi = _ratio_buckets(train_ratio, val_ratio)
        self.seed = seed

    def __call__(self, node_ids: np.ndarray) -> np.ndarray:
        """[N] node ids -> [N] int8 DatasetSplit assignments."""
        ids = np.asarray(node_ids)
        mixed = (
            ids.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
            + np.uint64((self.seed * 1_000_003) & 0xFFFFFFFFFFFFFFFF)
        ).view(np.int64)
        b = fast_hash(mixed).view(np.uint64) % np.uint64(_HASH_GRANULARITY)
        return _buckets_to_split(b.astype(np.int64), self.train_hi, self.val_hi)

    def split_ids(self, num_nodes: int) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Convenience: (train, val, test) node-id arrays for [0, num_nodes)."""
        a = self(np.arange(num_nodes, dtype=np.int64))
        return (np.nonzero(a == DatasetSplit.TRAIN)[0],
                np.nonzero(a == DatasetSplit.VAL)[0],
                np.nonzero(a == DatasetSplit.TEST)[0])


def inductive_message_mask(
    assignment: np.ndarray,
    src: np.ndarray,
    dst: np.ndarray,
    out_split: DatasetSplit,
) -> np.ndarray:
    """Which edges are visible for message passing in an INDUCTIVE
    node-classification split: both endpoints must be assigned to
    ``out_split`` (ref InductiveSupervisedNodeClassificationSplitStrategy.
    pruneOutsideNodesAndEdges — edges kept iff all endpoint nodes assign to
    the sample's split)."""
    assignment = np.asarray(assignment)
    return ((assignment[np.asarray(src)] == np.int8(out_split))
            & (assignment[np.asarray(dst)] == np.int8(out_split)))


class UserDefinedLabelsEdgeSplitter:
    """Hash-split user-provided supervision edges (positives and hard
    negatives) into TRAIN/VAL/TEST.

    Ref parity: UserDefinedLabelsEdgeToLinkSplitHashingAssigner — every
    bucket carries LinkUsage SUPERVISION only (user-defined labels are never
    message edges), and the UDL NALP split strategy
    (UserDefinedLabelsNodeAnchorBasedLinkPredictionSplitStrategy: "we retain
    all pb.neighborhood.edges as message passing edges") keeps the full
    structural neighborhood as the message graph in every split — so this
    splitter returns only a per-edge DatasetSplit and callers keep their
    message CSR unsplit.

    ``symmetric``: ref `should_split_edges_symmetrically` — (a->b) and
    (b->a) hash to the same bucket via canonical endpoint ordering.
    """

    def __init__(self, train_ratio: float = 0.8, val_ratio: float = 0.1,
                 seed: int = 42, symmetric: bool = False):
        self.train_hi, self.val_hi = _ratio_buckets(train_ratio, val_ratio)
        self.seed = seed
        self.symmetric = symmetric

    def __call__(self, src: np.ndarray, dst: np.ndarray) -> np.ndarray:
        """[E] src/dst -> [E] int8 DatasetSplit (usage is always
        SUPERVISION; see class docstring)."""
        src = np.asarray(src).astype(np.uint64)
        dst = np.asarray(dst).astype(np.uint64)
        if self.symmetric:
            src, dst = np.minimum(src, dst), np.maximum(src, dst)
        mixed = (
            src * np.uint64(0x9E3779B97F4A7C15)
            + dst
            + np.uint64((self.seed * 1_000_003 + 7) & 0xFFFFFFFFFFFFFFFF)
        ).view(np.int64)
        b = fast_hash(mixed).view(np.uint64) % np.uint64(_HASH_GRANULARITY)
        return _buckets_to_split(b.astype(np.int64), self.train_hi, self.val_hi)

    def split_edge_indices(
        self, src: np.ndarray, dst: np.ndarray
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """(train, val, test) column-index arrays into the input edge list."""
        a = self(src, dst)
        return (np.nonzero(a == DatasetSplit.TRAIN)[0],
                np.nonzero(a == DatasetSplit.VAL)[0],
                np.nonzero(a == DatasetSplit.TEST)[0])


def downsample_root_nodes(
    node_ids: np.ndarray,
    num_samples: int,
    seed: int = 0,
) -> np.ndarray:
    """Deterministically subsample a root-node set to ``num_samples``.

    Ref parity: SGS `downsampleNumberOfNodes`
    (SGSPureSparkV1Task.scala:1042-1081) caps the number of root nodes whose
    samples are materialized. The reference uses a nondeterministic Spark
    LIMIT (its own comment suggests sort-and-take-first for determinism);
    here we take the prefix of the hash-ordered ids — uniform AND
    reproducible across runs.
    """
    ids = np.asarray(node_ids)
    if num_samples <= 0 or num_samples >= len(ids):
        return ids
    mixed = (
        ids.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
        + np.uint64((seed * 1_000_003 + 13) & 0xFFFFFFFFFFFFFFFF)
    ).view(np.int64)
    order = np.argsort(fast_hash(mixed), kind="stable")
    return np.sort(ids[order[:num_samples]])


def select_ssl_positive_edges(
    edge_index: np.ndarray,
    positive_ratio: float,
    seed: int = 0,
) -> np.ndarray:
    """Sample a deterministic subset of structural edges as self-supervised
    positive labels.

    Ref parity: `python/gigl/distributed/dataset_factory.py:38-54`
    select_ssl_positive_label_edges — picks a ratio of edges as positives for
    self-supervised NALP. Returns column indices into ``edge_index``.
    """
    if not (0 < positive_ratio <= 1):
        raise ValueError(f"positive_ratio must be in (0,1]: {positive_ratio}")
    num_edges = edge_index.shape[1]
    num_pos = max(1, int(num_edges * positive_ratio)) if num_edges else 0
    rng = np.random.default_rng(seed)
    return np.sort(rng.choice(num_edges, size=num_pos, replace=False))
