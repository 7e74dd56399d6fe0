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

import os
import re
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.errors import AnalysisException

from .extract import SPANS_OUT_SCHEMA, extract_documents
from ..tables import read_table, write_table

LEDGER_SCHEMA = (
    "run_group string, group_id int, run_id string, num_groups int, "
    "committed_at timestamp"
)


class SimulatedFailure(RuntimeError):
    """Raised by tests to kill a run between group commits."""


class IncompatibleCheckpointError(RuntimeError):
    """The out_dir holds a ledger written by an older layout version."""


#: run_group charset: the id becomes a Hive partition VALUE (r=<run_id>)
#: and Spark percent-escapes special chars on write while our path
#: builders do not — a ':' or '%' in the group name would stage data
#: under an escaped directory the readers never look at and the vacuum
#: would then DELETE as an orphan. Reject instead of corrupting.
_RUN_GROUP_RE = re.compile(r"^[A-Za-z0-9._-]+$")


def _validate_run_group(run_group: str) -> None:
    if not _RUN_GROUP_RE.match(run_group):
        raise ValueError(
            f"run_group {run_group!r} must match [A-Za-z0-9._-]+ — it is "
            "embedded in Hive partition paths, and characters Spark "
            "percent-escapes (':', '%', '/', '=', …) would desynchronize "
            "the staged files from the reader/vacuum paths"
        )


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
        ledger = read_table(spark, _ledger_path(out_dir))
    except AnalysisException:
        # missing-path == "no checkpoint yet"; anything else (permission,
        # corruption, transient IO) must surface — mapping it to None
        # would silently re-extract everything or publish empty views
        return None
    if "num_groups" not in ledger.columns:
        # pre-attempt-dir ledger format (flat spans/ appends, parallelism-
        # derived groups): silently resuming would mis-assign group
        # membership and miss the old flat output files entirely
        raise IncompatibleCheckpointError(
            f"{_ledger_path(out_dir)} was written by an older checkpoint "
            "format (no num_groups column; spans were flat appends). "
            "Re-extract into a fresh out_dir, or migrate by adding a "
            "num_groups column and moving each group's files under "
            "spans/g=<group_id>/r=<run_id>/ to match its ledger row."
        )
    return ledger


def read_audit(spark: SparkSession, out_dir: str) -> DataFrame | None:
    try:
        return read_table(spark, _audit_path(out_dir))
    except AnalysisException:  # missing path only — see read_ledger
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
    num_groups-sized — driver-small by construction.

    SCOPING: with ``run_group=None`` the view CONCATENATES every
    run_group's published attempts — two run_groups that both extracted an
    overlapping document each contribute their rows. Use
    :func:`committed_spans_latest` when one row per document (latest
    publication wins) is the contract, e.g. for rebuilding derived tables."""
    latest = _latest_publications(spark, out_dir, run_group)
    if not latest:
        return spark.createDataFrame([], SPANS_OUT_SCHEMA)
    paths = [group_attempt_path(out_dir, r.group_id, r.run_id) for r in latest.values()]
    # explicit schema: skips footer inference and keeps an all-empty-group
    # read (zero staged files) well-defined
    return spark.read.schema(SPANS_OUT_SCHEMA).parquet(*paths)


def _latest_publications(
    spark: SparkSession, out_dir: str, run_group: str | None = None
) -> dict:
    """Latest ledger row per (run_group, group_id) — the live attempts."""
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
    return latest


def committed_spans_latest(spark: SparkSession, out_dir: str) -> DataFrame:
    """Cross-run_group published view resolved to ONE row per document.

    :func:`committed_spans` with ``run_group=None`` concatenates all
    run_groups, so a document two run_groups both extracted appears twice.
    Here the publication with the greatest (committed_at, run_id) wins per
    document — the view derived-table rebuilds want (see
    ``DocumentStore.ingest``). Cost: one extra shuffle (partial-aggregated
    ``max_by`` per doc_id) over the published rows — a rebuild-time path,
    not a per-query path."""
    latest = _latest_publications(spark, out_dir, None)
    if not latest:
        return spark.createDataFrame([], SPANS_OUT_SCHEMA)
    # ONE scan node regardless of attempt count: read every live attempt
    # path in a single multi-path parquet read with basePath so the g/r
    # partition columns surface, then attach the publication key by
    # broadcast-joining the (num-live-attempts)-sized ledger resolution.
    # (The round-3 formulation built one DataFrame per attempt and reduced
    # with unionByName — an O(attempts)-leg plan that is driver-slow to
    # analyze at the documented production shape of thousands of groups.)
    paths = [group_attempt_path(out_dir, r.group_id, r.run_id) for r in latest.values()]
    pub_rows = [
        # fixed-width timestamp + run_id → lexicographic == publication order
        (
            int(r.group_id),
            r.run_id,
            r.committed_at.strftime("%Y-%m-%d %H:%M:%S.%f") + "|" + r.run_id,
        )
        for r in latest.values()
    ]
    allp = (
        spark.read.schema(SPANS_OUT_SCHEMA + ", g int, r string")
        .option("basePath", output_path(out_dir))
        .parquet(*paths)
    )
    pub = spark.createDataFrame(pub_rows, "g int, r string, __pub string")
    allp = allp.join(F.broadcast(pub), ["g", "r"]).drop("g", "r")
    payload = [c for c in allp.columns if c not in ("doc_id", "__pub")]
    return (
        allp.groupBy("doc_id")
        .agg(F.max_by(F.struct(*payload), F.col("__pub")).alias("__row"))
        .select("doc_id", "__row.*")
    )


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
    latest = {
        key[1]: r
        for key, r in _latest_publications(spark, out_dir, run_group).items()
    }
    if not latest:
        return {"run_group": run_group, "groups_compacted": 0, "run_id": None}
    _validate_run_group(run_group)
    compact_id = f"{run_group}-compact-{uuid.uuid4().hex[:8]}"
    num_groups = _ledger_rows(spark, out_dir, run_group)[0].num_groups

    # Stage: ONE job rewrites every live group. Multi-path read with
    # basePath surfaces the g partition column; repartitioning on (g [,
    # salt]) gives each group target_partitions output files; the same
    # partitionBy(g, r) append used by run_extraction lands each group
    # under spans/g=<g>/r=<compact_id>. (The round-3 formulation ran one
    # Spark job + one 1-row ledger append per group — a driver-bound
    # afternoon at 10k groups.)
    paths = [group_attempt_path(out_dir, g, r.run_id) for g, r in latest.items()]
    src = (
        spark.read.schema(SPANS_OUT_SCHEMA + ", g int, r string")
        .option("basePath", output_path(out_dir))
        .parquet(*paths)
        .drop("r")
    )
    if target_partitions > 1:
        salt = F.pmod(F.xxhash64("doc_id"), F.lit(target_partitions))
        src = src.repartition(len(latest) * target_partitions, "g", salt)
    else:
        src = src.repartition(len(latest), "g")
    write_table(
        src.withColumn("r", F.lit(compact_id)),
        output_path(out_dir),
        mode="append",
        partition_by=("g", "r"),
    )
    for g in latest:
        _ensure_local_dir(group_attempt_path(out_dir, g, compact_id))

    # Publish: ONE ledger append carrying every group's row. A crash before
    # this append leaves the previous publications live (staged rewrite is
    # an invisible orphan — same stage-then-publish contract as extraction).
    ledger_rows = spark.createDataFrame(
        [(run_group, int(g), compact_id, int(num_groups)) for g in sorted(latest)],
        "run_group string, group_id int, run_id string, num_groups int",
    ).withColumn("committed_at", F.current_timestamp())
    write_table(ledger_rows.coalesce(1), _ledger_path(out_dir), mode="append")
    return {
        "run_group": run_group,
        "groups_compacted": len(latest),
        "run_id": compact_id,
    }


def vacuum_uncommitted(
    spark: SparkSession, out_dir: str, min_age_s: float = 3600.0
) -> list[str]:
    """Delete staged attempt directories that no ledger row ever published
    (crash leftovers) or that a later republication superseded. Driver-side
    filesystem walk — parquet mode only (Iceberg expires snapshots instead).
    Returns the removed paths.

    ``min_age_s`` (default 1 h) protects attempts staged by a STILL-RUNNING
    extraction: staging completes before the ledger row is appended, so a
    concurrently-running vacuum would otherwise see the not-yet-published
    attempt as an orphan and delete data the run is about to commit. Only
    attempts whose directory mtime is older than the guard are touched;
    pass ``min_age_s=0`` only when no extraction can be in flight."""
    import os
    import shutil

    root = output_path(out_dir)
    if not os.path.isdir(root):
        return []
    latest = _latest_publications(spark, out_dir)
    live = {(r.group_id, r.run_id) for r in latest.values()}
    now = time.time()
    removed = []
    for gdir in sorted(os.listdir(root)):
        if not gdir.startswith("g="):
            continue
        g = int(gdir.split("=", 1)[1])
        for rdir in sorted(os.listdir(os.path.join(root, gdir))):
            if not rdir.startswith("r="):
                continue
            rid = rdir.split("=", 1)[1]
            path = os.path.join(root, gdir, rdir)
            if (g, rid) not in live:
                try:
                    if now - os.path.getmtime(path) < min_age_s:
                        continue  # possibly staged by a run in flight
                except OSError:
                    continue
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

    SINGLE-PASS STAGING: one source scan extracts every pending group and a
    ``partitionBy(g, r)`` write lands each group under its own attempt
    directory ``spans/g=<g>/r=<run_id>`` in the same job. (The round-2
    formulation filtered the input once per group in a loop — a
    num_groups× read amplification on a non-group-bucketed source at
    100 TB.) Publication stays per-group: after staging, ledger rows are
    appended one group at a time, so a crash mid-publish leaves earlier
    groups committed and the rest as invisible orphans — the same atomic
    stage-then-publish contract, with a resume re-extracting only the
    unpublished groups.
    """
    if num_partitions is None:
        num_partitions = spark.sparkContext.defaultParallelism * 2
    _validate_run_group(run_group)
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
    pending = [g for g in range(num_groups) if g not in committed]

    # group assignment is a pure function of (doc_id, num_groups) — identical
    # across runs and cluster sizes (never derived from partition counts)
    group_col = F.pmod(F.xxhash64(F.col("doc_id")), F.lit(num_groups)).cast("int")

    if pending:
        t0 = time.monotonic()
        # ONE scan for all pending groups (a resume prunes the committed
        # ones; on a group-bucketed landing table this predicate
        # partition-prunes instead of filtering)
        src = (
            input_df.filter(~group_col.isin(sorted(committed)))
            if committed
            else input_df
        )
        staged = extract_documents(src, num_partitions).withColumns(
            {"g": group_col, "r": F.lit(run_id)}
        )
        write_table(
            staged, output_path(out_dir), mode="append", partition_by=("g", "r")
        )
        wall_ms = int((time.monotonic() - t0) * 1000)

        attempt_paths = [group_attempt_path(out_dir, g, run_id) for g in pending]
        for p in attempt_paths:
            # a pending group with zero input rows stages no files, but its
            # published path must exist for readers (local-fs parquet only;
            # an Iceberg snapshot has no such notion)
            _ensure_local_dir(p)

        # attempt-level lineage from the staged files themselves (verifies
        # the write; no persist of the full extraction output needed)
        audit = (
            spark.read.schema(SPANS_OUT_SCHEMA)
            .parquet(*attempt_paths)
            .groupBy("part_id")
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

    done_groups = 0
    if fail_before_publish is None and fail_after_group is None:
        # publish: ONE ledger append makes every pending group's staged
        # attempt live. (The round-3 formulation appended one 1-row file
        # per group — O(groups) sequential driver jobs, with each append
        # re-listing the growing ledger dir: quadratic at 10k groups. A
        # single coalesce(1) append is also a smaller crash window — the
        # publish is all-or-nothing, and a crash before it leaves every
        # staged group as an invisible orphan for resume, same contract.)
        if pending:
            ledger_rows = spark.createDataFrame(
                [(run_group, int(g), run_id, int(num_groups)) for g in pending],
                "run_group string, group_id int, run_id string, num_groups int",
            ).withColumn("committed_at", F.current_timestamp())
            write_table(ledger_rows.coalesce(1), _ledger_path(out_dir), mode="append")
        done_groups = len(pending)
    else:
        # test-only crash simulation: publish per group so the hooks can
        # model a crash mid-publish (on a real cluster this corresponds to
        # a partially-durable ledger append)
        for g in pending:
            if fail_before_publish is not None and g >= fail_before_publish:
                raise SimulatedFailure(f"simulated kill before publishing group {g}")
            ledger_row = spark.createDataFrame(
                [(run_group, g, run_id, num_groups)],
                "run_group string, group_id int, run_id string, num_groups int",
            ).withColumn("committed_at", F.current_timestamp())
            write_table(ledger_row.coalesce(1), _ledger_path(out_dir), mode="append")
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


def _ensure_local_dir(path: str) -> None:
    p = path.removeprefix("file:")
    if "://" not in p:
        os.makedirs(p, exist_ok=True)
