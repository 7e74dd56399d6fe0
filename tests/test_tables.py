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

    def createOrReplace(self):
        self._calls.append("createOrReplace")


class _FakeDF:
    def __init__(self, calls):
        self._calls = calls

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
        tables.write_table(_FakeDF(calls), "cat.db.spans", mode="append")
        tables.write_table(_FakeDF(calls), "cat.db.spans", mode="overwrite")
        assert calls == [
            ("writeTo", "cat.db.spans"),
            "append",
            ("writeTo", "cat.db.spans"),
            "createOrReplace",
        ]

    def test_unknown_mode_rejected(self, monkeypatch):
        monkeypatch.setattr(tables, "TABLE_FORMAT", "iceberg")
        with pytest.raises(ValueError, match="unsupported mode"):
            tables.write_table(_FakeDF([]), "cat.db.t", mode="merge")

    def test_read_uses_catalog_identifier(self, monkeypatch):
        monkeypatch.setattr(tables, "TABLE_FORMAT", "iceberg")
        calls: list = []
        assert tables.read_table(_FakeSpark(calls), "cat.db.spans") == "df"
        assert calls == [("read.table", "cat.db.spans")]
