"""End-to-end DocumentStore lifecycle: ingest → derived tables → search."""

from __future__ import annotations

import pandas as pd
import pytest

from ocr_search_spark.corpus import SPANS_IN_SCHEMA, build_local
from ocr_search_spark.kernels import extract_document_spans
from ocr_search_spark.store import DocumentStore


@pytest.fixture(scope="module")
def store(spark, base_texts, tmp_path_factory):
    docs = build_local(base_texts, 150)
    pdf = pd.DataFrame(
        {"doc_id": [d["doc_id"] for d in docs], "spans": [d["spans"] for d in docs]}
    )
    df = spark.createDataFrame(pdf, schema=SPANS_IN_SCHEMA)
    s = DocumentStore(spark, str(tmp_path_factory.mktemp("store")))
    s.ingest(df, num_partitions=8, num_groups=2)
    return s, docs


class TestLifecycle:
    def test_content_table_matches_golden(self, spark, store):
        s, docs = store
        content = {
            r.doc_id: r.content
            for r in spark.read.parquet(s.content_path).collect()
        }
        assert len(content) == len(docs)
        d0 = docs[0]
        golden = "\n".join(
            sp["text"] for sp in extract_document_spans(d0["spans"])
        )
        assert content[d0["doc_id"]] == golden

    def test_search_round_trip(self, spark, store):
        s, docs = store
        # pick a term guaranteed to exist: from the extracted content
        some = spark.read.parquet(s.content_path).first().content
        term = next(w for w in some.split() if w.isalpha() and len(w) > 3)
        res = s.search(term, limit=5)
        assert res["total"] >= 1
        items = res["items"].collect()
        assert 1 <= len(items) <= 5
        assert all(r.rank > 0 or r.sim >= 0 for r in items)

    def test_search_empty_query_latest(self, store):
        s, docs = store
        res = s.search("")
        assert res["total"] == len(docs)
        assert len(res["items"].collect()) == 10

    def test_content_table_carries_filename_and_meta(self, spark, store):
        """S10 + Q11 feed: ingest attaches filename/path_origin and the
        exiftool-analogue meta map, queryable via element_at."""
        from pyspark.sql import functions as F

        s, docs = store
        content = spark.read.parquet(s.content_path)
        assert {"filename", "path_origin", "meta"} <= set(content.columns)
        row = content.orderBy("doc_id").first()
        assert row.filename.startswith(row.doc_id + ".")
        assert row.path_origin == "store\\" + row.filename
        assert row.meta["FileSize"] == str(len(row.content))
        n_pdf = content.filter(
            F.element_at("meta", "FileType") == F.upper(
                F.regexp_extract("filename", r"\.([a-z]+)$", 1)
            )
        ).count()
        assert n_pdf == content.count()  # meta ext consistent with filename

    def test_second_ingest_under_new_run_group_keeps_both_batches(
        self, spark, base_texts, tmp_path_factory
    ):
        """Regression (round-2 advice): ingest rebuilt content/postings from
        only the current run_group, silently dropping earlier batches. Both
        batches must stay searchable; an overlapping doc resolves to the
        latest publication."""
        docs = build_local(base_texts, 40)
        mk = lambda ds: spark.createDataFrame(  # noqa: E731
            pd.DataFrame(
                {"doc_id": [d["doc_id"] for d in ds], "spans": [d["spans"] for d in ds]}
            ),
            schema=SPANS_IN_SCHEMA,
        )
        s = DocumentStore(spark, str(tmp_path_factory.mktemp("store2")))
        s.ingest(mk(docs[:25]), run_group="batch1", num_partitions=4, num_groups=2)
        # batch2 overlaps doc[20:25] but with truncated span lists
        overlap = [
            {"doc_id": d["doc_id"], "spans": d["spans"][:1]} for d in docs[20:25]
        ]
        s.ingest(
            mk(docs[25:] + overlap), run_group="batch2", num_partitions=4, num_groups=2
        )
        content = {
            r.doc_id: r.content for r in spark.read.parquet(s.content_path).collect()
        }
        assert len(content) == len(docs)  # both batches present, no dups
        d = docs[21]
        latest = "\n".join(
            sp["text"] for sp in extract_document_spans(d["spans"][:1])
        )
        assert content[d["doc_id"]] == latest  # overlap: latest ingest wins
        d_first = docs[0]
        golden = "\n".join(
            sp["text"] for sp in extract_document_spans(d_first["spans"])
        )
        assert content[d_first["doc_id"]] == golden  # batch1 docs untouched

    def test_search_items_link_from_path_origin(self, spark, store):
        s, docs = store
        some = spark.read.parquet(s.content_path).first().content
        term = next(w for w in some.split() if w.isalpha() and len(w) > 3)
        items = s.search(term, limit=3)["items"].collect()
        for r in items:
            assert r.link == "http://files.local/store/" + r.filename
            assert r.snippet_is_html is True
