#!/usr/bin/env python3
"""Pre-driver audit: run every registered query on a DEFAULT-config
SparkSession — the environment the correctness driver actually uses.

The repo's own session (ocr_search_spark.session.get_spark) excludes
optimizer rules and tunes Arrow/AQE; the driver's session does not. Two
optimizer landmines only reproduce under default optimization (see
ops/text_analysis.py _token_shingles):

* InferFiltersFromGenerate + pushdown inlining a computed-array producer
  into a scan-level filter;
* PushDownPredicate conjunct-splitting a gate predicate through the
  producer projections.

Both turn O(n) column work into O(n²·tokenize) per row when any HOF
lambda references an outer computed array. This script is the regression
net: every query must complete, and anything above the per-query budget
is reported as a failure.

Usage: python scripts/audit_driver_session.py [sf_dir] [budget_sec]
Exit code 1 when a query errors or exceeds the budget.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    # 60 s: the iterative CC compositions are per-job-overhead-bound and
    # measure ~10 s warm but ~30 s on a cold/contended session; the
    # pathologies this audit exists for (per-element re-evaluation) show
    # as minutes-to-hours, far above any overhead-bound query
    budget = float(sys.argv[2]) if len(sys.argv) > 2 else 60.0

    from pyspark.sql import SparkSession

    # deliberately NOT get_spark(): default optimizer rules, default AQE —
    # only core count and shuffle partitions are pinned for determinism
    spark = (
        SparkSession.builder.appName("driver-session-audit")
        .master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry

    bad = []
    for name, fn in entry.queries().items():
        t0 = time.monotonic()
        try:
            n_rows = fn(spark, sf_dir).count()
            dt = time.monotonic() - t0
        except Exception as exc:  # noqa: BLE001 — report, don't abort the sweep
            bad.append((name, f"ERROR {exc}"))
            print(f"FAIL  {name}: {str(exc)[:120]}", flush=True)
            continue
        status = "ok  " if dt <= budget else "SLOW"
        if dt > budget:
            bad.append((name, f"{dt:.1f}s > budget {budget:.0f}s"))
        print(f"{status}  {name}: {n_rows} rows in {dt:.1f}s", flush=True)

    spark.stop()
    if bad:
        print(f"\n{len(bad)} queries failed the driver-session audit:")
        for name, why in bad:
            print(f"  {name}: {why}")
        return 1
    print("\nALL OK under default optimization")
    return 0


if __name__ == "__main__":
    sys.exit(main())
