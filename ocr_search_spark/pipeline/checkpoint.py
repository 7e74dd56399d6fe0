"""Resumable extraction runs: checkpoint ledger + per-partition audit.

Replaces the reference's Redis job-state blob (reference:
app/broker/config.py:37-53 — ``{status, total, done, progress, ...}`` with a
12 h TTL) and its retry path (app/web/admin_jobs.py:48-69) with batch-native
lineage:

* the input is split into ``num_groups`` deterministic *commit groups*
  (``group_id = part_id % num_groups`` where ``part_id =
  pmod(xxhash64(doc_id), P)`` — pure functions of doc_id, so group
  membership is identical across runs);
* each group is extracted and appended to the output table, then an **audit**
  row per salt partition (run_id, partition_id, docs, spans, failures,
  wall_ms, committed_at — FIXTURES.md §5) and a **ledger** row
  (run_group, group_id) are committed;
* a restarted run with the same ``run_group`` anti-joins committed groups and
  processes only the remainder — a killed job never reprocesses committed
  partitions and never double-writes (Spark's parquet job commit is atomic:
  a group that died mid-write left no committed files).

On a real cluster the same design holds: the commit group is the unit of
re-work, sized so a restart loses at most 1/num_groups of progress, while
each group still fans out across all executors.
"""

from __future__ import annotations

import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .extract import extract_documents
from ..tables import read_table, write_table

LEDGER_SCHEMA = "run_group string, group_id int, run_id string, committed_at timestamp"


class SimulatedFailure(RuntimeError):
    """Raised by tests to kill a run between group commits."""


def _ledger_path(out_dir: str) -> str:
    return f"{out_dir}/_ledger"


def _audit_path(out_dir: str) -> str:
    return f"{out_dir}/_audit"


def output_path(out_dir: str) -> str:
    return f"{out_dir}/spans"


def read_ledger(spark: SparkSession, out_dir: str) -> DataFrame | None:
    try:
        return read_table(spark, _ledger_path(out_dir))
    except Exception:
        return None


def read_audit(spark: SparkSession, out_dir: str) -> DataFrame | None:
    try:
        return read_table(spark, _audit_path(out_dir))
    except Exception:
        return None


def _committed_groups(spark: SparkSession, out_dir: str, run_group: str) -> set[int]:
    ledger = read_ledger(spark, out_dir)
    if ledger is None:
        return set()
    rows = (
        ledger.filter(F.col("run_group") == run_group)
        .select("group_id")
        .distinct()
        .collect()
    )
    return {r.group_id for r in rows}


def run_extraction(
    spark: SparkSession,
    input_df: DataFrame,
    out_dir: str,
    run_group: str,
    num_partitions: int | None = None,
    num_groups: int = 4,
    fail_after_group: int | None = None,
) -> dict:
    """Run (or resume) an extraction over ``input_df`` into ``out_dir``.

    Returns summary stats. Idempotent per (run_group, out_dir): committed
    commit-groups are skipped on resume.
    """
    if num_partitions is None:
        num_partitions = spark.sparkContext.defaultParallelism * 2
    run_id = f"{run_group}-{uuid.uuid4().hex[:8]}"
    committed = _committed_groups(spark, out_dir, run_group)

    # group assignment is a pure function of doc_id — identical across runs
    group_col = F.pmod(
        F.pmod(F.xxhash64(F.col("doc_id")), F.lit(num_partitions)),
        F.lit(num_groups),
    ).cast("int")

    done_groups = 0
    for g in range(num_groups):
        if g in committed:
            continue
        t0 = time.monotonic()
        grp_input = input_df.filter(group_col == g)
        extracted = extract_documents(grp_input, num_partitions).persist()
        try:
            write_table(extracted, output_path(out_dir), mode="append")

            wall_ms = int((time.monotonic() - t0) * 1000)
            audit = (
                extracted.groupBy("part_id")
                .agg(
                    F.count("*").alias("docs"),
                    F.sum("n_spans").cast("long").alias("spans"),
                    F.sum("n_failures").cast("long").alias("failures"),
                )
                .select(
                    F.lit(run_id).alias("run_id"),
                    F.col("part_id").alias("partition_id"),
                    "docs",
                    "spans",
                    "failures",
                    F.lit(wall_ms).alias("wall_ms"),
                    F.current_timestamp().alias("committed_at"),
                )
            )
            write_table(audit.coalesce(1), _audit_path(out_dir), mode="append")

            ledger_row = spark.createDataFrame(
                [(run_group, g, run_id)], "run_group string, group_id int, run_id string"
            ).withColumn("committed_at", F.current_timestamp())
            write_table(ledger_row.coalesce(1), _ledger_path(out_dir), mode="append")
        finally:
            extracted.unpersist()

        done_groups += 1
        if fail_after_group is not None and g >= fail_after_group:
            raise SimulatedFailure(f"simulated kill after group {g}")

    return {
        "run_id": run_id,
        "run_group": run_group,
        "groups_total": num_groups,
        "groups_skipped": len(committed),
        "groups_processed": done_groups,
        "output": output_path(out_dir),
    }
