"""Structured Streaming tests: streaming extraction parity with batch, and
watermarked windowed aggregation."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from ocr_search_spark.corpus import SPANS_IN_SCHEMA, build_local
from ocr_search_spark.kernels import extract_document_spans
from ocr_search_spark.streaming import stream_extract, windowed_event_counts

from conftest import SF_DIR


@pytest.fixture(scope="module")
def docs(base_texts):
    return build_local(base_texts, 200)


class TestStreamExtract:
    def test_streaming_equals_batch_golden(self, spark, docs, tmp_path):
        src = str(tmp_path / "incoming")
        out = str(tmp_path / "out")
        ckpt = str(tmp_path / "ckpt")

        def write_chunk(chunk):
            pdf = pd.DataFrame(
                {"doc_id": [d["doc_id"] for d in chunk], "spans": [d["spans"] for d in chunk]}
            )
            spark.createDataFrame(pdf, schema=SPANS_IN_SCHEMA).write.mode(
                "append"
            ).parquet(src)

        # first wave of files, drain
        write_chunk(docs[:120])
        q = stream_extract(spark, src, out, ckpt, num_partitions=4)
        q.awaitTermination(120)

        # late-arriving second wave: only the new files are processed
        write_chunk(docs[120:])
        q = stream_extract(spark, src, out, ckpt, num_partitions=4)
        q.awaitTermination(120)

        got = {
            r.doc_id: [(s.kind, s.text, s.media_ref, s.order) for s in r.spans]
            for r in spark.read.parquet(out).collect()
        }
        want = {
            d["doc_id"]: [
                (s["kind"], s["text"], s["media_ref"], s["order"])
                for s in extract_document_spans(d["spans"])
            ]
            for d in docs
        }
        assert got == want  # exactly-once across two incremental drains


class TestWindowedCounts:
    def test_watermarked_window_agg(self, spark, tmp_path):
        rows = [
            ("2024-01-01 10:05:00", "click"),
            ("2024-01-01 10:55:00", "click"),
            ("2024-01-01 11:05:00", "view"),
        ]
        src = str(tmp_path / "events")
        spark.createDataFrame(rows, "ts string, event_type string").withColumn(
            "ts", F.col("ts").cast("timestamp")
        ).write.parquet(src)

        stream = spark.readStream.schema("ts timestamp, event_type string").parquet(src)
        agg = windowed_event_counts(stream)
        # complete mode: append-mode windows would only surface on a LATER
        # microbatch once the watermark passes; with a single availableNow
        # drain nothing would emit
        q = (
            agg.writeStream.format("memory")
            .queryName("win_counts")
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = {
            (str(r.window_start), r.event_type): r.cnt
            for r in spark.sql("SELECT * FROM win_counts").collect()
        }
        assert got == {
            ("2024-01-01 10:00:00", "click"): 2,
            ("2024-01-01 11:00:00", "view"): 1,
        }

    def test_batch_mode_window_agg(self, spark):
        events = spark.read.parquet(f"{SF_DIR}/events.parquet")
        res = windowed_event_counts(events)
        assert res.agg(F.sum("cnt")).collect()[0][0] == events.count()
