"""Resumable extraction runs: checkpoint ledger + per-partition audit.

Replaces the reference's Redis job-state blob (reference:
app/broker/config.py:37-53 — ``{status, total, done, progress, ...}`` with a
12 h TTL) and its retry path (app/web/admin_jobs.py:48-69) with batch-native
lineage:

* the input is split into ``num_groups`` deterministic *commit groups*:
  ``group_id = pmod(xxhash64(doc_id), num_groups)`` — a pure function of
  (doc_id, num_groups) ONLY, so membership is identical across runs
  regardless of cluster parallelism; ``num_groups`` is persisted in the
  ledger and a resume with a different value fails fast instead of
  silently re-partitioning the commit space;
* each group's output is **staged** under a group-keyed attempt directory
  ``spans/g=<group>/r=<run_id>`` and *published* only by its ledger row
  (run_group, group_id, run_id). Readers (:func:`committed_spans`) resolve
  the ledger and read exactly the published attempt directories — a crash
  after the spans write but before the ledger append leaves an orphan
  directory that is never read and is re-extracted (to a new attempt dir)
  on resume, so the committed view never loses or double-counts a row even
  though the three appends are not one transaction. (On Iceberg the same
  publish step is a single atomic snapshot commit; the staging directory is
  the parquet-filesystem equivalent.)
* an **audit** row per salt partition (run_id, partition_id, docs, spans,
  failures, wall_ms, committed_at — FIXTURES.md §5) records attempt-level
  lineage: every attempt is logged, the ledger says which one is live;
* a restarted run with the same ``run_group`` skips ledgered groups and
  processes only the remainder — a killed job never reprocesses committed
  groups.

On a real cluster the same design holds: the commit group is the unit of
re-work, sized so a restart loses at most 1/num_groups of progress, while
each group still fans out across all executors.
"""

from __future__ import annotations

import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .extract import SPANS_OUT_SCHEMA, extract_documents
from ..tables import read_table, write_table

LEDGER_SCHEMA = (
    "run_group string, group_id int, run_id string, num_groups int, "
    "committed_at timestamp"
)


class SimulatedFailure(RuntimeError):
    """Raised by tests to kill a run between group commits."""


def _ledger_path(out_dir: str) -> str:
    return f"{out_dir}/_ledger"


def _audit_path(out_dir: str) -> str:
    return f"{out_dir}/_audit"


def output_path(out_dir: str) -> str:
    return f"{out_dir}/spans"


def group_attempt_path(out_dir: str, group_id: int, run_id: str) -> str:
    return f"{output_path(out_dir)}/g={group_id}/r={run_id}"


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


def _ledger_rows(spark: SparkSession, out_dir: str, run_group: str) -> list:
    ledger = read_ledger(spark, out_dir)
    if ledger is None:
        return []
    return (
        ledger.filter(F.col("run_group") == run_group)
        .select("group_id", "run_id", "num_groups")
        .collect()
    )


def committed_spans(
    spark: SparkSession, out_dir: str, run_group: str | None = None
) -> DataFrame:
    """The published output view: exactly the ledgered attempt directories.

    Orphan attempts from crashed runs (staged but never published) are
    invisible here. When a group has several ledger rows (e.g. after
    :func:`compact_group_outputs` republished it), the LATEST publication
    wins — older attempts become invisible history. The ledger is
    num_groups-sized — driver-small by construction."""
    ledger = read_ledger(spark, out_dir)
    if ledger is not None and run_group is not None:
        ledger = ledger.filter(F.col("run_group") == run_group)
    rows = (
        ledger.select("run_group", "group_id", "run_id", "committed_at").collect()
        if ledger is not None
        else []
    )
    latest: dict[tuple, object] = {}
    for r in rows:
        key = (r.run_group, r.group_id)
        if key not in latest or (r.committed_at, r.run_id) > (
            latest[key].committed_at,
            latest[key].run_id,
        ):
            latest[key] = r
    if not latest:
        return spark.createDataFrame([], SPANS_OUT_SCHEMA)
    paths = [group_attempt_path(out_dir, r.group_id, r.run_id) for r in latest.values()]
    return spark.read.parquet(*paths)


def compact_group_outputs(
    spark: SparkSession,
    out_dir: str,
    run_group: str,
    target_partitions: int = 1,
) -> dict:
    """Small-files hygiene: rewrite each published group into a compacted
    attempt directory and republish it (latest ledger row wins).

    Every group append fans out over all executors, so a long-running table
    accumulates P files per group per run — the classic small-files problem
    at 10^12 rows. Compaction reuses the same stage-then-publish protocol as
    extraction: readers never see a half-written rewrite, and a crash
    mid-compaction leaves the previous publication live. (On Iceberg this is
    `rewrite_data_files` — same idea, catalog-native.)"""
    rows = _ledger_rows(spark, out_dir, run_group)
    latest: dict[int, object] = {}
    for r in rows:
        if r.group_id not in latest:
            latest[r.group_id] = r
    compact_id = f"{run_group}-compact-{uuid.uuid4().hex[:8]}"
    ledger = read_ledger(spark, out_dir)
    done = 0
    for g in sorted(latest):
        live = (
            ledger.filter(
                (F.col("run_group") == run_group) & (F.col("group_id") == g)
            )
            .orderBy(F.col("committed_at").desc(), F.col("run_id").desc())
            .limit(1)
            .collect()[0]
        )
        src = group_attempt_path(out_dir, g, live.run_id)
        df = spark.read.parquet(src).coalesce(target_partitions)
        write_table(df, group_attempt_path(out_dir, g, compact_id), mode="overwrite")
        ledger_row = spark.createDataFrame(
            [(run_group, g, compact_id, live.num_groups)],
            "run_group string, group_id int, run_id string, num_groups int",
        ).withColumn("committed_at", F.current_timestamp())
        write_table(ledger_row.coalesce(1), _ledger_path(out_dir), mode="append")
        done += 1
    return {"run_group": run_group, "groups_compacted": done, "run_id": compact_id}


def vacuum_uncommitted(spark: SparkSession, out_dir: str) -> list[str]:
    """Delete staged attempt directories that no ledger row ever published
    (crash leftovers) or that a later republication superseded. Driver-side
    filesystem walk — parquet mode only (Iceberg expires snapshots instead).
    Returns the removed paths."""
    import os
    import shutil

    root = output_path(out_dir)
    if not os.path.isdir(root):
        return []
    ledger = read_ledger(spark, out_dir)
    rows = (
        ledger.select("run_group", "group_id", "run_id", "committed_at").collect()
        if ledger is not None
        else []
    )
    latest: dict[tuple, object] = {}
    for r in rows:
        key = (r.run_group, r.group_id)
        if key not in latest or (r.committed_at, r.run_id) > (
            latest[key].committed_at,
            latest[key].run_id,
        ):
            latest[key] = r
    live = {(r.group_id, r.run_id) for r in latest.values()}
    removed = []
    for gdir in sorted(os.listdir(root)):
        if not gdir.startswith("g="):
            continue
        g = int(gdir.split("=", 1)[1])
        for rdir in sorted(os.listdir(os.path.join(root, gdir))):
            if not rdir.startswith("r="):
                continue
            rid = rdir.split("=", 1)[1]
            if (g, rid) not in live:
                path = os.path.join(root, gdir, rdir)
                shutil.rmtree(path, ignore_errors=True)
                removed.append(path)
    return removed


def run_extraction(
    spark: SparkSession,
    input_df: DataFrame,
    out_dir: str,
    run_group: str,
    num_partitions: int | None = None,
    num_groups: int = 4,
    fail_after_group: int | None = None,
    fail_before_publish: int | None = None,
) -> dict:
    """Run (or resume) an extraction over ``input_df`` into ``out_dir``.

    Returns summary stats. Idempotent per (run_group, out_dir): ledgered
    commit-groups are skipped on resume; read results back with
    :func:`committed_spans`, never by globbing the staging directory.
    """
    if num_partitions is None:
        num_partitions = spark.sparkContext.defaultParallelism * 2
    run_id = f"{run_group}-{uuid.uuid4().hex[:8]}"
    prior = _ledger_rows(spark, out_dir, run_group)
    for r in prior:
        if r.num_groups != num_groups:
            raise ValueError(
                f"resume with num_groups={num_groups} but ledger for "
                f"{run_group!r} was committed with num_groups={r.num_groups}; "
                "group membership would change — refusing to resume"
            )
    committed = {r.group_id for r in prior}

    # group assignment is a pure function of (doc_id, num_groups) — identical
    # across runs and cluster sizes (never derived from partition counts)
    group_col = F.pmod(F.xxhash64(F.col("doc_id")), F.lit(num_groups)).cast("int")

    done_groups = 0
    for g in range(num_groups):
        if g in committed:
            continue
        t0 = time.monotonic()
        grp_input = input_df.filter(group_col == g)
        extracted = extract_documents(grp_input, num_partitions).persist()
        try:
            # stage: attempt-keyed directory, invisible until published
            write_table(
                extracted, group_attempt_path(out_dir, g, run_id), mode="overwrite"
            )

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

            if fail_before_publish is not None and g >= fail_before_publish:
                raise SimulatedFailure(f"simulated kill before publishing group {g}")

            # publish: the ledger row makes this attempt the live one
            ledger_row = spark.createDataFrame(
                [(run_group, g, run_id, num_groups)],
                "run_group string, group_id int, run_id string, num_groups int",
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
