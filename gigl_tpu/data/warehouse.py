"""Warehouse (BigQuery-shaped) table utilities with a functional local
backend.

Ref parity: `python/gigl/src/common/utils/bq.py` (472 LoC BqUtils —
create/empty tables, load rows, count rows/cols, run query, existence,
delete, path helpers, export). The reference talks to google-cloud-
bigquery; here the same capability surface is a protocol with two
backends:

  - ``SqliteWarehouse`` — REAL tables and queries on stdlib sqlite3
    (a functional warehouse in egress-free environments; the analog of
    BigQuery emulators in the reference's test strategy),
  - ``BigQueryWarehouse`` — thin google-cloud-bigquery mapping, importable
    only where the SDK ships (raises with guidance otherwise).

Path convention matches BqUtils: ``project.dataset.table`` (":" accepted
between project and dataset); `format_bq_path` / `parse_bq_table_path` /
`join_path` reproduce the reference's semantics bit-for-bit (bq.py:146-201
— contract parity, these strings feed shared configs).
"""

from __future__ import annotations

import re
import sqlite3
from typing import Any, Dict, Iterable, List, Optional, Sequence, Tuple

from gigl_tpu.utils.logger import get_logger

logger = get_logger(__name__)


def format_bq_path(bq_path: str, format_for_table_reference: bool = False
                   ) -> str:
    """bq.py:146-176 semantics: normalize ':' to '.', validate 1-2 dots,
    optionally re-insert ':' after the project for table references."""
    bq_path = bq_path.replace(":", ".")
    n = bq_path.count(".")
    assert 0 < n < 3, \
        "BQ path expected to contain project + dataset and/or table."
    out = bq_path
    if format_for_table_reference and n == 2:
        out = out.replace(".", ":", 1)
    return out


def join_path(path: str, *paths: str) -> str:
    joined = ".".join([path, *paths])
    assert joined.count(".") <= 2, f"Invalid BQ path: {joined}"
    return format_bq_path(joined)


def parse_bq_table_path(bq_table_path: str) -> Tuple[str, str, str]:
    parts = format_bq_path(bq_table_path).split(".")
    assert len(parts) == 3, \
        "bqtable_path should be in the format project.dataset.table"
    return parts[0], parts[1], parts[2]


_IDENT = re.compile(r"^[A-Za-z_][A-Za-z0-9_\-]*$")


class SqliteWarehouse:
    """BqUtils capability surface over sqlite3 (":memory:" by default —
    pass a filesystem path for persistence). Tables are namespaced
    ``dataset__table``; the project id is carried but not namespaced
    (one sqlite file == one project)."""

    def __init__(self, path: str = ":memory:", project: Optional[str] = None):
        self.project = project or "local"
        self._db = sqlite3.connect(path)
        self._datasets: set = set()

    # -- naming ------------------------------------------------------------
    def _sql_name(self, bq_table_path: str) -> str:
        proj, ds, tbl = parse_bq_table_path(
            self._qualify(bq_table_path))
        for part in (proj, ds, tbl):
            if not _IDENT.match(part):
                raise ValueError(f"invalid BQ path component {part!r}")
        return f"{ds}__{tbl}".replace("-", "_")

    def _qualify(self, path: str) -> str:
        """Accept dataset.table by prepending the client project (the
        BigQuery default-project convention)."""
        p = path.replace(":", ".")
        return p if p.count(".") == 2 else f"{self.project}.{p}"

    # -- datasets ------------------------------------------------------------
    def create_bq_dataset(self, dataset_id: str, exists_ok: bool = True
                          ) -> None:
        ds = format_bq_path(dataset_id)
        if ds in self._datasets and not exists_ok:
            raise ValueError(f"dataset {ds} exists")
        self._datasets.add(ds)

    # -- tables ------------------------------------------------------------
    def create_or_empty_bq_table(self, bq_table_path: str,
                                 schema: Sequence[Tuple[str, str]]) -> None:
        """schema: [(column, type)] with BQ type names (INTEGER/FLOAT/
        STRING/BYTES mapped onto sqlite affinities)."""
        name = self._sql_name(bq_table_path)
        typemap = {"INTEGER": "INTEGER", "INT64": "INTEGER",
                   "FLOAT": "REAL", "FLOAT64": "REAL",
                   "STRING": "TEXT", "BYTES": "BLOB"}
        cols = ", ".join(
            f'"{c}" {typemap.get(t.upper(), "TEXT")}' for c, t in schema)
        cur = self._db.cursor()
        cur.execute(f'DROP TABLE IF EXISTS "{name}"')
        cur.execute(f'CREATE TABLE "{name}" ({cols})')
        self._db.commit()

    def does_bq_table_exist(self, bq_table_path: str) -> bool:
        name = self._sql_name(bq_table_path)
        row = self._db.execute(
            "SELECT 1 FROM sqlite_master WHERE type='table' AND name=?",
            (name,)).fetchone()
        return row is not None

    def delete_bq_table_if_exist(self, bq_table_path: str) -> None:
        name = self._sql_name(bq_table_path)
        self._db.execute(f'DROP TABLE IF EXISTS "{name}"')
        self._db.commit()

    def load_rows_to_bq(self, bq_table_path: str,
                        rows: Iterable[Dict[str, Any]]) -> int:
        """Streaming-insert analog (bq.py:379). Returns rows written."""
        name = self._sql_name(bq_table_path)
        rows = list(rows)
        if not rows:
            return 0
        cols = list(rows[0].keys())
        ph = ", ".join("?" for _ in cols)
        col_sql = ", ".join(f'"{c}"' for c in cols)
        self._db.executemany(
            f'INSERT INTO "{name}" ({col_sql}) VALUES ({ph})',
            [tuple(r[c] for c in cols) for r in rows])
        self._db.commit()
        return len(rows)

    def count_number_of_rows_in_bq_table(self, bq_table_path: str) -> int:
        name = self._sql_name(bq_table_path)
        return int(self._db.execute(
            f'SELECT COUNT(*) FROM "{name}"').fetchone()[0])

    def count_number_of_columns_in_bq_table(self, bq_table_path: str) -> int:
        name = self._sql_name(bq_table_path)
        return len(self._db.execute(
            f'SELECT * FROM "{name}" LIMIT 0').description)

    def fetch_bq_table_schema(self, bq_table_path: str) -> Dict[str, str]:
        name = self._sql_name(bq_table_path)
        return {r[1]: r[2] for r in self._db.execute(
            f'PRAGMA table_info("{name}")')}

    def check_columns_exist_in_table(self, bq_table_path: str,
                                     columns: Sequence[str]) -> None:
        have = set(self.fetch_bq_table_schema(bq_table_path))
        missing = [c for c in columns if c not in have]
        if missing:
            raise ValueError(
                f"columns {missing} do not exist in {bq_table_path}")

    def run_query(self, query: str, **params) -> List[Tuple]:
        """Direct SQL execution (bq.py:123 run_query analog). BQ-path
        backtick references `project.dataset.table` are rewritten onto
        the sqlite table names."""
        def sub(m):
            return f'"{self._sql_name(m.group(1))}"'

        query = re.sub(r"`([^`]+)`", sub, query)
        return list(self._db.execute(query, params or {}))

    def export_to_files(self, bq_table_path: str, out_path: str) -> int:
        """export_to_gcs analog: dump the table as CSV to a local/URI
        path; returns rows written."""
        import csv
        import io

        from gigl_tpu.data.uri import UriFactory

        name = self._sql_name(bq_table_path)
        cur = self._db.execute(f'SELECT * FROM "{name}"')
        buf = io.StringIO()
        w = csv.writer(buf)
        w.writerow([d[0] for d in cur.description])
        n = 0
        for row in cur:
            w.writerow(row)
            n += 1
        UriFactory.create(out_path).write_text(buf.getvalue())
        return n


class BigQueryWarehouse:  # pragma: no cover - needs cloud SDK + egress
    """google-cloud-bigquery mapping of the same surface (the reference's
    BqUtils proper). Import-gated; method-for-method delegation."""

    def __init__(self, project: Optional[str] = None):
        try:
            from google.cloud import bigquery  # noqa: F401
        except ImportError as e:
            raise ImportError(
                "BigQueryWarehouse needs google-cloud-bigquery; in "
                "egress-free environments use SqliteWarehouse") from e
        from google.cloud import bigquery

        self._client = bigquery.Client(project=project)

    def run_query(self, query: str, **params):
        return list(self._client.query(query).result())

    def does_bq_table_exist(self, bq_table_path: str) -> bool:
        from google.api_core.exceptions import NotFound

        try:
            self._client.get_table(format_bq_path(bq_table_path))
            return True
        except NotFound:
            return False

    def count_number_of_rows_in_bq_table(self, bq_table_path: str) -> int:
        t = format_bq_path(bq_table_path)
        return next(iter(self.run_query(
            f"SELECT COUNT(*) FROM `{t}`")))[0]
