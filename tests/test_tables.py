"""tables.py format-dispatch tests: the Iceberg branch has no runtime jar in
this sandbox, so its dispatch logic is verified against writer/reader fakes
(the parquet branch is exercised end-to-end by every pipeline test)."""

from __future__ import annotations

import pytest

from ocr_search_spark import tables


class _FakeWriter:
    def __init__(self, calls):
        self._calls = calls

    def append(self):
        self._calls.append("append")

    def create(self):
        self._calls.append("create")

    def createOrReplace(self):
        self._calls.append("createOrReplace")

    def partitionedBy(self, *cols):
        self._calls.append(("partitionedBy", len(cols)))
        return self


class _FakeCatalog:
    def __init__(self, existing):
        self._existing = existing

    def tableExists(self, identifier):
        return identifier in self._existing


class _FakeSession:
    def __init__(self, existing):
        self.catalog = _FakeCatalog(existing)


class _FakeDF:
    def __init__(self, calls, existing=()):
        self._calls = calls
        self.sparkSession = _FakeSession(set(existing))

    def writeTo(self, identifier):
        self._calls.append(("writeTo", identifier))
        return _FakeWriter(self._calls)


class _FakeReader:
    def __init__(self, calls):
        self._calls = calls

    def table(self, identifier):
        self._calls.append(("read.table", identifier))
        return "df"


class _FakeSpark:
    def __init__(self, calls):
        self.read = _FakeReader(calls)


class TestIcebergDispatch:
    def test_write_modes_map_to_writeTo_verbs(self, monkeypatch):
        monkeypatch.setattr(tables, "TABLE_FORMAT", "iceberg")
        calls: list = []
        existing = ("cat.db.spans",)
        tables.write_table(_FakeDF(calls, existing), "cat.db.spans", mode="append")
        tables.write_table(_FakeDF(calls, existing), "cat.db.spans", mode="overwrite")
        assert calls == [
            ("writeTo", "cat.db.spans"),
            "append",
            ("writeTo", "cat.db.spans"),
            "createOrReplace",
        ]

    def test_first_append_creates_missing_table(self, monkeypatch):
        """DataFrameWriterV2.append() errors on a missing table, so the
        first append of a fresh pipeline must go through create()."""
        monkeypatch.setattr(tables, "TABLE_FORMAT", "iceberg")
        calls: list = []
        # no partition_by: building identity-partition Columns needs an
        # active SparkContext, which the fake-only test deliberately lacks
        tables.write_table(_FakeDF(calls), "cat.db.new", mode="append")
        assert calls == [("writeTo", "cat.db.new"), "create"]

    def test_bucketed_sort_col_rejected_in_iceberg_mode(self, monkeypatch):
        """Silently dropping the within-bucket sort order would be a
        silent perf contract break — must refuse loudly."""
        monkeypatch.setattr(tables, "TABLE_FORMAT", "iceberg")
        with pytest.raises(ValueError, match="sort_col"):
            tables.write_bucketed_table(
                _FakeDF([]), "cat.db.b", "doc_id", 8, sort_col="doc_id"
            )

    def test_env_var_honored_after_import(self, monkeypatch):
        """SPARK_GRAFT_TABLE_FORMAT set after module import must still
        switch the dispatch (call-time config, not import-time)."""
        monkeypatch.delattr(tables, "__never__", raising=False)
        monkeypatch.setenv("SPARK_GRAFT_TABLE_FORMAT", "iceberg")
        calls: list = []
        tables.write_table(
            _FakeDF(calls, ("cat.db.t",)), "cat.db.t", mode="append"
        )
        assert calls == [("writeTo", "cat.db.t"), "append"]

    def test_unknown_mode_rejected(self, monkeypatch):
        monkeypatch.setattr(tables, "TABLE_FORMAT", "iceberg")
        with pytest.raises(ValueError, match="unsupported mode"):
            tables.write_table(_FakeDF([]), "cat.db.t", mode="merge")

    def test_read_uses_catalog_identifier(self, monkeypatch):
        monkeypatch.setattr(tables, "TABLE_FORMAT", "iceberg")
        calls: list = []
        assert tables.read_table(_FakeSpark(calls), "cat.db.spans") == "df"
        assert calls == [("read.table", "cat.db.spans")]
