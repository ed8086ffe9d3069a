"""Pre-flight config validation.

Ref parity: `python/gigl/src/validation_check/config_validator.py:44-232`
(`kfp_validation_checks`) — class-path checks, asset-existence checks, and
task/graph coherence checks keyed by which component the pipeline starts at.
"""

from __future__ import annotations

from typing import List, Optional

from gigl_tpu.config.task_config import TaskConfig
from gigl_tpu.types.task import TaskMetadataType
from gigl_tpu.utils.registry import import_obj


class ConfigValidationError(ValueError):
    pass


def validate_task_config(
    config: TaskConfig, start_at: str = "config_populator"
) -> List[str]:
    """Run all applicable checks; raises ConfigValidationError on failure,
    returns the list of check names that ran."""
    ran: List[str] = []

    def check(name: str, ok: bool, msg: str):
        ran.append(name)
        if not ok:
            raise ConfigValidationError(f"[{name}] {msg}")

    gm = config.graph_metadata
    tm = config.task_metadata

    # Task/graph coherence (ref: config_validator.py task checks).
    if tm.task_type == TaskMetadataType.NODE_BASED_TASK:
        check(
            "supervision_node_types_nonempty",
            len(tm.supervision_node_types) > 0,
            "node_based_task requires supervision_node_types",
        )
        for nt in tm.supervision_node_types:
            check(
                "supervision_node_type_known",
                nt in gm.node_types,
                f"supervision node type {nt!r} not in graph metadata",
            )
    elif tm.task_type == TaskMetadataType.NODE_ANCHOR_BASED_LINK_PREDICTION_TASK:
        check(
            "supervision_edge_types_nonempty",
            len(tm.supervision_edge_types) > 0,
            "node_anchor_based_link_prediction_task requires supervision_edge_types",
        )
        for et in tm.supervision_edge_types:
            check(
                "supervision_edge_type_known",
                et in gm.edge_types,
                f"supervision edge type {et} not in graph metadata",
            )

    # Sampling DAG validation (ref: Appendix A.3,
    # pb_wrappers/subgraph_sampling_strategy.py:23-135).
    sampling = config.dataset.sampling
    for root_nt, ops in sampling.message_passing_paths.items():
        check(
            "sampling_root_node_type_known",
            root_nt in gm.node_types,
            f"sampling path root node type {root_nt!r} unknown",
        )
        names = [op.op_name for op in ops]
        check(
            "sampling_op_names_unique",
            len(set(names)) == len(names),
            f"duplicate sampling op names in path for {root_nt!r}: {names}",
        )
        by_name = {op.op_name: op for op in ops}
        # frontier node type produced by an op: the "far" end of the sampled
        # edge (INCOMING walks to src side, OUTGOING to dst side) — ref
        # subgraph_sampling_strategy.proto:26-29,54-58.
        def frontier(op):
            return (
                op.edge_type.src_node_type
                if op.sampling_direction == "INCOMING"
                else op.edge_type.dst_node_type
            )

        def anchor(op):
            return (
                op.edge_type.dst_node_type
                if op.sampling_direction == "INCOMING"
                else op.edge_type.src_node_type
            )

        for op in ops:
            check(
                "sampling_edge_type_known",
                op.edge_type in gm.edge_types,
                f"sampling op {op.op_name!r}: unknown edge type {op.edge_type}",
            )
            if not op.input_op_names:
                # Root op must touch the root node type.
                check(
                    "sampling_root_op_touches_root",
                    anchor(op) == root_nt,
                    f"root sampling op {op.op_name!r} anchors on {anchor(op)!r},"
                    f" expected root node type {root_nt!r}",
                )
            for parent_name in op.input_op_names:
                check(
                    "sampling_parent_exists",
                    parent_name in by_name,
                    f"sampling op {op.op_name!r}: unknown parent {parent_name!r}",
                )
                parent = by_name[parent_name]
                check(
                    "sampling_frontier_consistent",
                    anchor(op) == frontier(parent),
                    f"sampling op {op.op_name!r} anchors on {anchor(op)!r} but"
                    f" parent {parent_name!r} frontier is {frontier(parent)!r}",
                )
        # Topological coherence: every op reachable, no cycles.
        _check_acyclic(by_name, check)

    # Class-path checks (ref: config_validator.py cls-path checks) — only when
    # the relevant component will run.
    if config.trainer.trainer_cls_path:
        try:
            import_obj(config.trainer.trainer_cls_path)
            ran.append("trainer_cls_importable")
        except Exception as e:
            raise ConfigValidationError(
                f"[trainer_cls_importable] cannot import "
                f"{config.trainer.trainer_cls_path!r}: {e}"
            )
    if config.inferencer.inferencer_cls_path:
        try:
            import_obj(config.inferencer.inferencer_cls_path)
            ran.append("inferencer_cls_importable")
        except Exception as e:
            raise ConfigValidationError(
                f"[inferencer_cls_importable] cannot import "
                f"{config.inferencer.inferencer_cls_path!r}: {e}"
            )

    # Split ratios sane.
    sp = config.dataset.split
    if not (0 < sp.train_ratio < 1 and 0 <= sp.val_ratio < 1):
        raise ConfigValidationError(
            f"[split_ratios] bad ratios train={sp.train_ratio} val={sp.val_ratio}"
        )
    if sp.train_ratio + sp.val_ratio >= 1.0:
        raise ConfigValidationError(
            "[split_ratios] train_ratio + val_ratio must leave room for test"
        )
    ran.append("split_ratios")
    return ran


def _check_acyclic(by_name, check):
    WHITE, GRAY, BLACK = 0, 1, 2
    color = {n: WHITE for n in by_name}

    def visit(n, stack):
        if color[n] == GRAY:
            raise ConfigValidationError(
                f"[sampling_dag_acyclic] cycle through {n!r}: {stack}"
            )
        if color[n] == BLACK:
            return
        color[n] = GRAY
        for p in by_name[n].input_op_names:
            if p in by_name:
                visit(p, stack + [p])
        color[n] = BLACK

    for n in by_name:
        visit(n, [n])
    check("sampling_dag_acyclic", True, "")
