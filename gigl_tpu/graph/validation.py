"""Graph data validation: dangling edges, id ranges, sample checks.

Ref parity:
  - `python/gigl/analytics/graph_validation/bq_graph_validator.py:17`
    BQGraphValidator — checks for dangling edges (edges whose endpoint has
    no node row) in warehouse tables; here the same checks run on in-memory
    / loaded arrays.
  - `scala/.../TaskOutputValidator.scala:29-60` — every emitted sample's
    edge types validated against graph metadata (here: validate_graph on
    the HeteroGraph before training).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List

import numpy as np

from gigl_tpu.graph.csr import HeteroGraph
from gigl_tpu.utils.logger import get_logger

logger = get_logger(__name__)


@dataclass
class GraphValidationReport:
    ok: bool
    errors: List[str] = field(default_factory=list)
    warnings: List[str] = field(default_factory=list)
    stats: Dict[str, int] = field(default_factory=dict)

    def raise_if_invalid(self) -> None:
        if not self.ok:
            raise ValueError("graph validation failed:\n- "
                             + "\n- ".join(self.errors))


def validate_graph(graph: HeteroGraph,
                   *, check_isolated: bool = True) -> GraphValidationReport:
    """Dangling-edge + id-range + feature-shape validation."""
    errors: List[str] = []
    warnings: List[str] = []
    stats: Dict[str, int] = {}
    for et, coo in graph.edges.items():
        n_src = graph.num_nodes[et.src_node_type]
        n_dst = graph.num_nodes[et.dst_node_type]
        dangling_src = int(((coo[0] < 0) | (coo[0] >= n_src)).sum())
        dangling_dst = int(((coo[1] < 0) | (coo[1] >= n_dst)).sum())
        stats[f"dangling_src::{et}"] = dangling_src
        stats[f"dangling_dst::{et}"] = dangling_dst
        if dangling_src:
            errors.append(
                f"{et}: {dangling_src} edges reference src ids outside "
                f"[0, {n_src}) — dangling edges (ref BQGraphValidator "
                "does this check in BigQuery)")
        if dangling_dst:
            errors.append(
                f"{et}: {dangling_dst} edges reference dst ids outside "
                f"[0, {n_dst})")
        if coo.shape[1] == 0:
            warnings.append(f"{et}: no edges")
    for nt in graph.metadata.node_types:
        n = graph.num_nodes[nt]
        if nt in graph.node_features:
            f = graph.node_features[nt]
            if f.shape[0] != n:
                errors.append(
                    f"node type {nt!r}: features have {f.shape[0]} rows but "
                    f"num_nodes={n}")
            if not np.isfinite(np.asarray(f, np.float32)).all():
                errors.append(f"node type {nt!r}: non-finite feature values")
        if nt in graph.node_labels and len(graph.node_labels[nt]) != n:
            errors.append(
                f"node type {nt!r}: {len(graph.node_labels[nt])} labels for "
                f"{n} nodes")
    if check_isolated:
        for nt in graph.metadata.node_types:
            n = graph.num_nodes[nt]
            touched = np.zeros(n, bool)
            for et, coo in graph.edges.items():
                if et.src_node_type == nt:
                    touched[np.clip(coo[0], 0, n - 1)] = True
                if et.dst_node_type == nt:
                    touched[np.clip(coo[1], 0, n - 1)] = True
            iso = int(n - touched.sum())
            stats[f"isolated::{nt}"] = iso
            if iso:
                warnings.append(
                    f"node type {nt!r}: {iso} isolated nodes (the sampler "
                    "emits fully-masked neighborhoods for these — ref SGS "
                    "createIsolatedNodesSubgraph handles them with "
                    "self-loops)")
    for msg in warnings:
        logger.warning("graph validation: %s", msg)
    return GraphValidationReport(ok=not errors, errors=errors,
                                 warnings=warnings, stats=stats)


class WarehouseGraphValidator:
    """SQL-side edge-table validation against a warehouse — the analog of
    the reference's BQGraphValidator (analytics/graph_validation/
    bq_graph_validator.py:11-56: a COUNT(*) over NULL endpoints run as a
    BigQuery query). Runs the same query shape against any
    data/warehouse.py backend (SqliteWarehouse locally, BigQueryWarehouse
    in cloud deployments)."""

    @staticmethod
    def does_edge_table_have_dangling_edges(
        warehouse,
        edge_table: str,
        src_node_column_name: str,
        dst_node_column_name: str,
    ) -> bool:
        """True if any edge row has a NULL src or dst endpoint."""
        from gigl_tpu.data.warehouse import _IDENT

        # Accept 2-part (dataset.table — the BigQuery default-project
        # convention the warehouse backends support) or 3-part paths.
        parts = edge_table.replace(":", ".").split(".")
        if len(parts) not in (2, 3):
            raise ValueError(
                f"edge_table must be dataset.table or "
                f"project.dataset.table, got {edge_table!r}")
        for part in parts:
            if not _IDENT.match(part):
                raise ValueError(
                    f"invalid BQ path component {part!r} in {edge_table!r}")
        for col in (src_node_column_name, dst_node_column_name):
            if not _IDENT.match(col):
                raise ValueError(f"invalid column name {col!r}")
        count = warehouse.run_query(
            f"SELECT COUNT(*) FROM `{edge_table}` "
            f"WHERE {src_node_column_name} IS NULL "
            f"OR {dst_node_column_name} IS NULL")[0][0]
        if count:
            logger.error("edge table %s has %d dangling edges",
                         edge_table, count)
        return count != 0
