"""Physical-plan regression tests: the optimizations we rely on at 100 TB
must be visible in the plan, not assumed (predicate pushdown, column
pruning, single-exchange extraction, broadcast joins, partition balance)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from ocr_search_spark.corpus import SPANS_IN_SCHEMA, build_local
from ocr_search_spark.pipeline import extract_documents
from conftest import SF_DIR


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def optimized_of(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


class TestScanPushdown:
    def test_filter_pushed_to_parquet(self, spark):
        df = spark.read.parquet(f"{SF_DIR}/events.parquet").filter(
            F.col("event_type") == "click"
        )
        plan = df.queryExecution().simpleString() if hasattr(df, "queryExecution") else plan_of(df)
        assert "PushedFilters: [IsNotNull(event_type), EqualTo(event_type,click)" in plan_of(df)

    def test_column_pruning(self, spark):
        df = spark.read.parquet(f"{SF_DIR}/events.parquet").select("event_id")
        assert "ReadSchema: struct<event_id:bigint>" in plan_of(df)


class TestExtractionPlan:
    def test_single_exchange(self, spark, base_texts):
        docs = build_local(base_texts, 50)
        pdf = pd.DataFrame(
            {"doc_id": [d["doc_id"] for d in docs], "spans": [d["spans"] for d in docs]}
        )
        df = spark.createDataFrame(pdf, schema=SPANS_IN_SCHEMA)
        plan = plan_of(extract_documents(df, 8))
        assert plan.count("Exchange") == 1  # only the salt repartition
        assert "MapInArrow" in plan


class TestBroadcast:
    def test_cosine_topk_broadcasts_queries(self, spark):
        from ocr_search_spark.ops.similarity import cosine_topk

        emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        plan = plan_of(cosine_topk(emb, emb.filter(F.col("vec_id") < 3), k=5))
        assert "Broadcast" in plan  # small query side broadcast, corpus streams

    def test_postings_term_join_broadcasts(self, spark):
        from ocr_search_spark.search.engine import build_postings, search_documents

        docs = spark.createDataFrame(
            [("d1", "spark join")], "doc_id string, content string"
        )
        postings = build_postings(docs)
        res = search_documents(docs, "spark", postings=postings)
        assert res["total"] == 1  # semi-join path executes


class TestPartitionBalance:
    def test_salt_spreads_docs_and_giants(self, spark, base_texts):
        """Skew defense: no salt partition holds a disproportionate share
        (the 1%-giant-PDF tail must not pile onto few partitions)."""
        docs = build_local(base_texts, 1000)
        pdf = pd.DataFrame(
            {"doc_id": [d["doc_id"] for d in docs], "spans": [d["spans"] for d in docs]}
        )
        df = spark.createDataFrame(pdf, schema=SPANS_IN_SCHEMA)
        out = extract_documents(df, 16)
        stats = (
            out.groupBy("part_id")
            .agg(F.count("*").alias("docs"), F.sum("n_spans").alias("spans"))
            .collect()
        )
        assert len(stats) == 16
        docs_counts = [r.docs for r in stats]
        span_counts = [r.spans for r in stats]
        mean_docs = sum(docs_counts) / len(docs_counts)
        assert max(docs_counts) < 2 * mean_docs
        mean_spans = sum(span_counts) / len(span_counts)
        assert max(span_counts) < 3 * mean_spans  # giants spread, not clustered
