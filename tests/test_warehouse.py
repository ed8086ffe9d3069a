"""Warehouse (BqUtils-shaped) utilities: sqlite backend + path helpers +
embedding export loading (ref src/common/utils/bq.py, export path
load_embeddings_to_bigquery)."""

import numpy as np
import pytest

from gigl_tpu.data.warehouse import (
    SqliteWarehouse,
    format_bq_path,
    join_path,
    parse_bq_table_path,
)


class TestPathHelpers:
    """Bit-for-bit with BqUtils.format_bq_path/parse/join (bq.py:146-201)."""

    def test_format_normalizes_colon(self):
        assert format_bq_path("proj:ds.tbl") == "proj.ds.tbl"
        assert format_bq_path("proj.ds") == "proj.ds"
        assert format_bq_path("ds.tbl") == "ds.tbl"

    def test_format_for_table_reference(self):
        assert format_bq_path("proj.ds.tbl", True) == "proj:ds.tbl"
        assert format_bq_path("proj.ds", True) == "proj.ds"

    def test_rejects_bad_paths(self):
        with pytest.raises(AssertionError):
            format_bq_path("noparts")
        with pytest.raises(AssertionError):
            format_bq_path("a.b.c.d")

    def test_join_and_parse(self):
        assert join_path("proj", "ds", "tbl") == "proj.ds.tbl"
        assert parse_bq_table_path("proj:ds.tbl") == ("proj", "ds", "tbl")
        with pytest.raises(AssertionError):
            join_path("proj", "ds", "tbl", "extra")


class TestSqliteWarehouse:
    def _wh(self):
        wh = SqliteWarehouse(project="proj")
        wh.create_bq_dataset("proj.ds")
        return wh

    def test_create_load_count_query(self):
        wh = self._wh()
        wh.create_or_empty_bq_table(
            "proj.ds.users", [("id", "INTEGER"), ("name", "STRING"),
                              ("score", "FLOAT")])
        assert wh.does_bq_table_exist("proj.ds.users")
        n = wh.load_rows_to_bq("proj.ds.users", [
            {"id": 1, "name": "a", "score": 0.5},
            {"id": 2, "name": "b", "score": 1.5},
        ])
        assert n == 2
        assert wh.count_number_of_rows_in_bq_table("proj.ds.users") == 2
        assert wh.count_number_of_columns_in_bq_table("proj.ds.users") == 3
        rows = wh.run_query(
            "SELECT name FROM `proj.ds.users` WHERE score > 1.0")
        assert rows == [("b",)]

    def test_create_or_empty_empties(self):
        wh = self._wh()
        wh.create_or_empty_bq_table("proj.ds.t", [("x", "INTEGER")])
        wh.load_rows_to_bq("proj.ds.t", [{"x": 1}])
        wh.create_or_empty_bq_table("proj.ds.t", [("x", "INTEGER")])
        assert wh.count_number_of_rows_in_bq_table("proj.ds.t") == 0

    def test_schema_and_column_checks(self):
        wh = self._wh()
        wh.create_or_empty_bq_table("proj.ds.t", [("a", "INTEGER"),
                                                  ("b", "STRING")])
        assert set(wh.fetch_bq_table_schema("proj.ds.t")) == {"a", "b"}
        wh.check_columns_exist_in_table("proj.ds.t", ["a"])
        with pytest.raises(ValueError, match="do not exist"):
            wh.check_columns_exist_in_table("proj.ds.t", ["zz"])

    def test_default_project_qualification(self):
        wh = self._wh()
        wh.create_or_empty_bq_table("ds.t2", [("x", "INTEGER")])
        assert wh.does_bq_table_exist("proj.ds.t2")

    def test_delete_and_injection_guard(self):
        wh = self._wh()
        wh.create_or_empty_bq_table("proj.ds.t", [("x", "INTEGER")])
        wh.delete_bq_table_if_exist("proj.ds.t")
        assert not wh.does_bq_table_exist("proj.ds.t")
        with pytest.raises(ValueError, match="invalid"):
            wh._sql_name('proj.ds."t; DROP TABLE x"')

    def test_export_to_files(self, tmp_path):
        wh = self._wh()
        wh.create_or_empty_bq_table("proj.ds.t", [("x", "INTEGER")])
        wh.load_rows_to_bq("proj.ds.t", [{"x": 7}, {"x": 8}])
        out = tmp_path / "dump.csv"
        assert wh.export_to_files("proj.ds.t", str(out)) == 2
        assert out.read_text().splitlines()[0] == "x"


class TestEmbeddingExportToWarehouse:
    def test_shards_load_into_table(self, tmp_path):
        from gigl_tpu.data.export import (
            EmbeddingExporter,
            load_embeddings_to_table,
            warehouse_embedding_writer,
        )

        d = 4
        with EmbeddingExporter(str(tmp_path / "emb")) as ex:
            ex.add_embeddings(np.arange(10),
                              np.random.default_rng(0).normal(
                                  size=(10, d)).astype(np.float32))
        wh = SqliteWarehouse(project="p")
        writer = warehouse_embedding_writer(wh, "p.ds.embeddings", d)
        n = load_embeddings_to_table(str(tmp_path / "emb"),
                                     table_writer=writer)
        assert n == 10
        assert wh.count_number_of_rows_in_bq_table("p.ds.embeddings") == 10
        assert wh.count_number_of_columns_in_bq_table(
            "p.ds.embeddings") == d + 1
        rows = wh.run_query(
            "SELECT node_id FROM `p.ds.embeddings` ORDER BY node_id")
        assert [r[0] for r in rows] == list(range(10))


class TestWarehouseGraphValidator:
    def test_dangling_edge_detection_via_sql(self):
        """BQGraphValidator analog: the NULL-endpoint COUNT query runs
        against the local warehouse backend."""
        from gigl_tpu.graph.validation import WarehouseGraphValidator

        wh = SqliteWarehouse(project="p")
        wh.create_or_empty_bq_table(
            "p.g.edges", [("src", "INTEGER"), ("dst", "INTEGER")])
        wh.load_rows_to_bq("p.g.edges", [
            {"src": 1, "dst": 2}, {"src": 2, "dst": 3}])
        assert not WarehouseGraphValidator.does_edge_table_have_dangling_edges(
            wh, "p.g.edges", "src", "dst")
        wh.load_rows_to_bq("p.g.edges", [{"src": 4, "dst": None}])
        assert WarehouseGraphValidator.does_edge_table_have_dangling_edges(
            wh, "p.g.edges", "src", "dst")
