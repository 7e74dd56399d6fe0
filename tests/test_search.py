"""Search-layer tests (Q1-Q12 semantics, app/search.py:10-99)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ocr_search_spark.search import (
    build_postings,
    fts_match,
    search_documents,
    snippet_expr,
    tokens_expr,
    trigram_sim_expr,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        ("d1", "spark joins tables fast", "2024-01-05 10:00:00", "alice@corp.ru"),
        ("d2", "spark join spark join spark", "2024-06-01 10:00:00", "bob@mail.com"),
        ("d3", "nothing relevant here", "2024-06-02 10:00:00", "alice@corp.ru"),
        ("d4", "Spark JOIN uppercase", "2025-01-01 10:00:00", "carol@corp.ru"),
        ("d5", "", "2023-01-01 10:00:00", "dave@x.io"),
    ]
    df = spark.createDataFrame(
        rows, "doc_id string, content string, created_at string, email string"
    )
    return df.withColumn("created_at", F.col("created_at").cast("timestamp"))


class TestPredicates:
    def test_fts_and_semantics(self, docs):
        got = sorted(
            r.doc_id
            for r in docs.filter(fts_match(tokens_expr("content"), ["spark", "join"])).collect()
        )
        assert got == ["d2", "d4"]  # d1 has 'joins' not 'join'

    def test_tokens_lowercase_and_split(self, spark):
        df = spark.createDataFrame([("Привет, Spark-world!",)], "t string")
        assert df.select(tokens_expr("t")).collect()[0][0] == [
            "привет", "spark", "world",
        ]

    def test_trigram_sim_bounds(self, docs):
        vals = [r[0] for r in docs.select(trigram_sim_expr("content", "spark")).collect()]
        assert all(0.0 <= v <= 1.0 for v in vals)
        # identical string => sim 1.0
        one = docs.sparkSession.createDataFrame([("spark",)], "content string")
        assert one.select(trigram_sim_expr("content", "spark")).collect()[0][0] == 1.0

    def test_snippet_marks_hit(self, docs):
        r = (
            docs.filter(F.col("doc_id") == "d2")
            .select(snippet_expr("content", "spark"))
            .collect()[0][0]
        )
        assert "<b>spark</b>" in r


class TestSearchFlow:
    def test_nonempty_query(self, docs):
        res = search_documents(docs, "spark join", limit=10)
        assert res["total"] == 2
        items = res["items"].collect()
        assert [r.doc_id for r in items] == ["d2", "d4"]  # d2 ranks first (more hits)
        assert items[0].rank == 1.0

    def test_filters_combined(self, docs):
        res = search_documents(
            docs, "spark", ocr_user="corp.ru",
            ocr_from="2024-01-01 00:00:00", ocr_to="2024-12-31 00:00:00",
        )
        assert res["total"] == 1  # d1 only (d2 wrong email, d4 out of range)
        assert res["items"].collect()[0].doc_id == "d1"

    def test_empty_query_latest_10(self, docs):
        res = search_documents(docs, "")
        assert res["total"] == 5
        items = res["items"].collect()
        assert items[0].doc_id == "d4"  # newest first (intended Q10 semantics)

    def test_pagination(self, docs):
        page2 = search_documents(docs, "spark", limit=1, offset=1)
        assert page2["total"] == 3
        assert len(page2["items"].collect()) == 1

    def test_postings_semi_join_path_equals_scan_path(self, docs):
        postings = build_postings(docs, "doc_id", "content")
        a = search_documents(docs, "spark join")
        b = search_documents(docs, "spark join", postings=postings)
        assert a["total"] == b["total"]
        assert sorted(r.doc_id for r in a["items"].collect()) == sorted(
            r.doc_id for r in b["items"].collect()
        )

    def test_postings_positions(self, docs):
        postings = build_postings(docs, "doc_id", "content")
        row = postings.filter(
            (F.col("term") == "spark") & (F.col("doc_id") == "d2")
        ).collect()[0]
        assert row.tf == 3
        assert sorted(row.positions) == [0, 2, 4]
