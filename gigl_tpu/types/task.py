"""Task metadata types.

Ref parity: `python/gigl/src/common/types/task_metadata.py` TaskMetadataType and
`proto/snapchat/research/gbml/gbml_config.proto:20-36` TaskMetadata oneof
(node_based_task, node_anchor_based_link_prediction_task, link_based_task).
"""

from __future__ import annotations

import enum
from dataclasses import dataclass, field
from typing import Mapping, Optional, Sequence, Tuple

from gigl_tpu.types.graph import EdgeType, NodeType, _as_edge_type


class TaskMetadataType(str, enum.Enum):
    NODE_BASED_TASK = "node_based_task"
    NODE_ANCHOR_BASED_LINK_PREDICTION_TASK = (
        "node_anchor_based_link_prediction_task"
    )
    LINK_BASED_TASK = "link_based_task"


@dataclass(frozen=True)
class TaskMetadata:
    """Which task to run and over which node/edge types.

    - NODE_BASED_TASK: supervised node classification over
      ``supervision_node_types``.
    - NODE_ANCHOR_BASED_LINK_PREDICTION_TASK: link prediction anchored on
      root nodes, supervised by ``supervision_edge_types``.
    - LINK_BASED_TASK: edge-level task over ``supervision_edge_types``.
    """

    task_type: TaskMetadataType
    supervision_node_types: Tuple[NodeType, ...] = ()
    supervision_edge_types: Tuple[EdgeType, ...] = ()

    def __post_init__(self):
        object.__setattr__(
            self, "supervision_node_types", tuple(self.supervision_node_types)
        )
        object.__setattr__(
            self,
            "supervision_edge_types",
            tuple(_as_edge_type(e) for e in self.supervision_edge_types),
        )
        if isinstance(self.task_type, str) and not isinstance(
            self.task_type, TaskMetadataType
        ):
            object.__setattr__(
                self, "task_type", TaskMetadataType(self.task_type)
            )

    def to_dict(self) -> dict:
        return {
            "task_type": self.task_type.value,
            "supervision_node_types": list(self.supervision_node_types),
            "supervision_edge_types": [str(e) for e in self.supervision_edge_types],
        }

    @classmethod
    def from_dict(cls, d: Mapping) -> "TaskMetadata":
        return cls(
            task_type=TaskMetadataType(d["task_type"]),
            supervision_node_types=tuple(d.get("supervision_node_types", ())),
            supervision_edge_types=tuple(
                _as_edge_type(e) for e in d.get("supervision_edge_types", ())
            ),
        )
