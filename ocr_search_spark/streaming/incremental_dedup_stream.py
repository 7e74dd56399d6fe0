"""Streaming incremental near-dedup against a persisted signature store.

The continuous-crawl form of ``ops.dedup.incremental_near_dedup``: an
unbounded document stream is consumed in micro-batches; each batch is
near-deduped against the accepted corpus's MinHash signature STORE (a
parquet table on disk — the durable state), survivors are published, and
the survivors' signatures are appended to the store so later batches
dedup against them. State lives in the store table, not in Spark
streaming state — unbounded corpus, bounded executor memory.

Idempotency (foreachBatch is at-least-once): both sinks are partitioned
by ``batch_id`` and each batch OVERWRITES only its own partition — a
replayed batch rewrites the same directories instead of duplicating
(the ``stream.write_batch_idempotent`` discipline). Because a replayed
batch may have already appended its own signatures before crashing, the
store read for batch N explicitly EXCLUDES partition N: without that, a
replay would dedup the batch against itself and drop every document.

Scale: per batch the store is touched join-only through the LSH band
equi-join (`ops.dedup` docs); the store grows ~0.4 kB per accepted doc
and is never collected. Compact old batch_id partitions offline when
file counts matter (pipeline.checkpoint's compaction applies).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _sig_schema(id_type: T.DataType, n_hashes: int) -> T.StructType:
    fields = [T.StructField("id", id_type)] + [
        T.StructField(f"mh{i}", T.StringType()) for i in range(n_hashes)
    ]
    return T.StructType(fields)


def read_sig_store(
    spark: SparkSession,
    store_dir: str,
    id_type: T.DataType,
    n_hashes: int = 8,
    exclude_batch_id: int | None = None,
) -> DataFrame:
    """The accepted-corpus signature store (id, mh0..mhN-1) — empty with
    the right schema when the store does not exist yet (first batch).
    ``exclude_batch_id`` drops that batch's own partition (replay
    safety; see module docstring)."""
    from pyspark.errors import AnalysisException

    try:
        df = spark.read.option("basePath", store_dir).parquet(store_dir)
    except AnalysisException as e:
        # only a genuinely-absent/empty store means "first batch";
        # any other failure (corrupt store, permissions) must surface —
        # silently treating it as empty would re-admit every duplicate
        msg = str(e)
        if not any(
            k in msg
            for k in (
                "PATH_NOT_FOUND",
                "Path does not exist",
                "UNABLE_TO_INFER_SCHEMA",
                "Unable to infer schema",
            )
        ):
            raise
        return spark.createDataFrame([], _sig_schema(id_type, n_hashes))
    if exclude_batch_id is not None:
        df = df.filter(F.col("batch_id") != int(exclude_batch_id))
    return df.select("id", *[f"mh{i}" for i in range(n_hashes)])


def process_incremental_batch(
    batch_df: DataFrame,
    batch_id: int,
    store_dir: str,
    out_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    n_hashes: int = 8,
    band_size: int = 2,
    shingle_k: int = 3,
    max_bucket_size: int | None = None,
) -> None:
    """foreachBatch body: dedup ``batch_df`` against the store, publish
    survivors to ``out_dir/batch_id=N``, append their signatures to
    ``store_dir/batch_id=N`` (both overwrite-own-partition idempotent).
    Survivor rows are written BEFORE the store partition: a crash
    between the two writes replays the batch, whose overwrite of both
    partitions converges to the same state."""
    from ..ops.dedup import incremental_near_dedup

    spark = batch_df.sparkSession
    id_type = batch_df.schema[id_col].dataType
    base = read_sig_store(
        spark, store_dir, id_type, n_hashes, exclude_batch_id=batch_id
    )
    survivors, sigs = incremental_near_dedup(
        batch_df,
        id_col,
        text_col,
        base,
        threshold=threshold,
        n_hashes=n_hashes,
        band_size=band_size,
        shingle_k=shingle_k,
        max_bucket_size=max_bucket_size,
    )
    survivors.write.mode("overwrite").parquet(f"{out_dir}/batch_id={batch_id}")
    sigs.write.mode("overwrite").parquet(f"{store_dir}/batch_id={batch_id}")


def incremental_dedup_stream(
    docs: DataFrame,
    store_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    **dedup_kwargs,
):
    """Wire a streaming document DataFrame through per-batch incremental
    near-dedup. Returns the started StreamingQuery (availableNow
    semantics are the caller's trigger choice via ``.trigger`` — this
    helper starts with the default micro-batch trigger unless
    ``trigger_available_now=True`` is passed in ``dedup_kwargs``)."""
    available_now = bool(dedup_kwargs.pop("trigger_available_now", False))

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        process_incremental_batch(
            batch_df,
            batch_id,
            store_dir,
            out_dir,
            id_col=id_col,
            text_col=text_col,
            **dedup_kwargs,
        )

    writer = docs.writeStream.foreachBatch(_process).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
