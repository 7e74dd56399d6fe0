"""Streaming exact deduplication over an unbounded document stream.

Batch exact dedup (ops.dedup.exact_dedup_groups) groups the whole corpus by
content fingerprint; a stream can't wait for "the whole corpus", so the
streaming form keeps fingerprint state bounded by a watermark:
``dropDuplicatesWithinWatermark`` retains each fingerprint only while a
duplicate could still arrive (event time within the watermark delay), which
is the standard Spark pattern for at-scale streaming dedup — state size is
O(arrival rate × delay), not O(corpus).

The fingerprint is the same md5-of-text used by the batch/oracle path, so a
document admitted by the stream and the batch keeper row agree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_stream(
    docs: DataFrame,
    *,
    watermark: str = "1 hour",
    id_col: str = "doc_id",
    text_col: str = "text",
    ts_col: str = "ts",
) -> DataFrame:
    """First occurrence of each text fingerprint within the watermark window.

    ``docs`` is a streaming DataFrame with an event-time column ``ts_col``.
    Exact duplicates (same md5(text)) arriving within ``watermark`` of the
    first occurrence are dropped; the fingerprint's state is evicted once
    the watermark passes, bounding memory on an unbounded stream.
    """
    fp = docs.select(
        F.col(id_col),
        F.col(ts_col),
        F.md5(F.col(text_col)).alias("fingerprint"),
    )
    return fp.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        ["fingerprint"]
    )


def dedup_batch_twin(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    ts_col: str = "ts",
) -> DataFrame:
    """Batch formulation of ``dedup_stream``'s keeper contract: the first
    occurrence — min ``ts_col``, ties to min ``id_col`` — of each
    md5(text) fingerprint survives.

    For an in-event-time-order stream (arrival order == event-time
    order) this is exactly what ``dropDuplicatesWithinWatermark`` admits;
    the pytest equivalence test feeds the stream in order and compares
    against this function, and the driver certifies the shared semantics
    through the ``dedup_stream_twin`` oracle query. Out-of-order arrival
    keeps the first ARRIVING row instead — the inherent stream/batch
    divergence the watermark bounds but cannot remove.
    """
    from pyspark.sql import Window

    fp = docs.select(
        F.col(id_col),
        F.col(ts_col),
        F.md5(F.col(text_col)).alias("fingerprint"),
    )
    w = Window.partitionBy("fingerprint").orderBy(
        F.col(ts_col).asc(), F.col(id_col).asc()
    )
    return (
        fp.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
