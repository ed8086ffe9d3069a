"""Node-id enumeration: arbitrary ids -> dense int64 ids (+ reverse maps).

Ref parity: the Data Preprocessor's enumeration stage
(`python/gigl/src/data_preprocessor/lib/enumerate/utils.py:105` Enumerator;
`lib/enumerate/queries.py:4-14` UNIQUE_NODE_ENUMERATION_QUERY — a BigQuery
``ROW_NUMBER() OVER (ORDER BY node_id)`` per node type, then joins mapping
features and edge lists onto the dense ids). Here the same contract is a
host-side NumPy job: deterministic dense ids by sorted order of the original
ids; un-enumeration (the Post Processor's reverse join,
post_process/post_processor.py:109-139) is the stored reverse array.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, Mapping, Tuple

import numpy as np

from gigl_tpu.types.graph import EdgeType, NodeType


@dataclass
class EnumerationMap:
    """orig id <-> dense id for one node type (dense id = sorted rank)."""

    orig_ids: np.ndarray  # [N] sorted original ids; dense id i -> orig_ids[i]

    @property
    def num_nodes(self) -> int:
        return len(self.orig_ids)

    def to_dense(self, ids: np.ndarray) -> np.ndarray:
        """Map original ids -> dense; raises on unknown ids."""
        ids = np.asarray(ids)
        pos = np.searchsorted(self.orig_ids, ids)
        pos_clipped = np.clip(pos, 0, len(self.orig_ids) - 1)
        ok = self.orig_ids[pos_clipped] == ids
        if not ok.all():
            bad = ids[~ok][:5]
            raise KeyError(f"Unknown node ids (first 5): {bad.tolist()}")
        return pos_clipped.astype(np.int64)

    def to_orig(self, dense: np.ndarray) -> np.ndarray:
        return self.orig_ids[np.asarray(dense)]


class Enumerator:
    """Enumerate node ids per node type; remap edge lists."""

    def __init__(self):
        self.maps: Dict[NodeType, EnumerationMap] = {}

    def enumerate_nodes(
        self, ids_by_type: Mapping[NodeType, np.ndarray]
    ) -> Dict[NodeType, EnumerationMap]:
        for nt, ids in ids_by_type.items():
            uniq = np.unique(np.asarray(ids))
            self.maps[nt] = EnumerationMap(orig_ids=uniq)
        return self.maps

    def enumerate_edges(
        self,
        edge_type: EdgeType,
        src_ids: np.ndarray,
        dst_ids: np.ndarray,
    ) -> np.ndarray:
        """Returns dense [2, E] edge index using the per-endpoint-type maps."""
        src_map = self.maps[edge_type.src_node_type]
        dst_map = self.maps[edge_type.dst_node_type]
        return np.stack([src_map.to_dense(src_ids), dst_map.to_dense(dst_ids)])

    def unenumerate(self, node_type: NodeType, dense: np.ndarray) -> np.ndarray:
        """Ref parity: post-processor un-enumeration (reverse id join)."""
        return self.maps[node_type].to_orig(dense)

    # -- persistence -----------------------------------------------------------
    def save(self, uri) -> None:
        import io

        from gigl_tpu.data.uri import UriFactory

        buf = io.BytesIO()
        np.savez_compressed(
            buf, **{f"map_{nt}": m.orig_ids for nt, m in self.maps.items()})
        UriFactory.create(uri).write_bytes(buf.getvalue())

    @classmethod
    def load(cls, uri) -> "Enumerator":
        import io

        from gigl_tpu.data.uri import UriFactory

        e = cls()
        with np.load(io.BytesIO(UriFactory.create(uri).read_bytes()),
                     allow_pickle=False) as z:
            for key in z.files:
                nt = key[len("map_"):]
                e.maps[nt] = EnumerationMap(orig_ids=z[key])
        return e
