#!/usr/bin/env python3
"""Per-query isolation harness (guide §1.4): time one or more declared
queries with the noop sink, optionally dump .explain("formatted") and
job-level timing, WITHOUT touching the frozen bench.py protocol.

Usage:
    python bench_extra.py q1 [q2 ...]          # warmup + min-of-N timing
    python bench_extra.py --explain q1 [...]   # also write plans to stdout
    python bench_extra.py --reps 3 q1          # change timed repetitions

Environment: same contract as bench.py ($SPARK_GRAFT_SF_DIR,
$SPARK_GRAFT_CPUS).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    if "--skew-leg" in sys.argv:
        skew_leg()
        return
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--explain", action="store_true")
    ap.add_argument("--explain-dir", default=None,
                    help="write <name>.txt explain files here")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--no-warmup", action="store_true")
    args = ap.parse_args()

    from ocr_search_spark.session import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark("bench_extra", cores=CPUS, shuffle_partitions=max(CPUS, 16))
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    out: dict[str, object] = {}
    for name in args.names:
        fn = qs[name]
        spark.sparkContext.setJobDescription(f"bench_extra:{name}")
        if args.explain or args.explain_dir:
            import io
            from contextlib import redirect_stdout

            buf = io.StringIO()
            with redirect_stdout(buf):
                fn(spark, SF_DIR).explain("formatted")
            if args.explain_dir:
                os.makedirs(args.explain_dir, exist_ok=True)
                with open(os.path.join(args.explain_dir, f"{name}.txt"), "w") as f:
                    f.write(buf.getvalue())
            else:
                print(f"===== {name} =====\n{buf.getvalue()}")
        if not args.no_warmup:
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        best, samples = float("inf"), []
        for _ in range(args.reps):
            t0 = time.monotonic()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            dt = time.monotonic() - t0
            samples.append(round(dt, 3))
            best = min(best, dt)
        out[name] = {"min": round(best, 3), "samples": samples}
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps({"all": out}))
    spark.stop()




def skew_leg() -> None:
    """Skewed-corpus blowup leg (guide §2.5; VERDICT r5 item 7): 1% of
    docs carry 256 spans (the giant-PDF tail of SURVEY §7), extracted
    through the real checkpointed pipeline; the audit table's
    per-partition SPAN counts then measure whether the salt spreads the
    heavy docs (extraction cost is span-proportional, and wall_ms in the
    audit is stage-level by design) — max/median spans per partition
    under ~2x = no straggler partition.

    Usage: python bench_extra.py --skew-leg    (prints one JSON line)
    """
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from bench import ensure_corpus
    from ocr_search_spark.pipeline.checkpoint import read_audit, run_extraction
    from ocr_search_spark.session import get_spark

    spark = get_spark("bench_extra_skew", cores=CPUS, shuffle_partitions=max(CPUS, 16))
    spark.sparkContext.setLogLevel("ERROR")
    corpus = spark.read.parquet(ensure_corpus(spark, SF_DIR))
    # 1% giant tail: repeat each victim's span list up to 256 entries
    # (deterministic md5 pick, orders re-stamped so span order stays valid)
    victim = F.conv(F.substring(F.md5(F.col("doc_id")), 1, 4), 16, 10) % 100 == 0
    fat = F.slice(
        F.flatten(F.array_repeat(F.col("spans"), 256)), 1, 256
    )
    restamped = F.transform(
        fat,
        lambda s, i: F.struct(
            s["kind"].alias("kind"),
            s["text"].alias("text"),
            s["media_ref"].alias("media_ref"),
            i.alias("offset"),
        ),
    )
    skewed = corpus.select(
        "doc_id",
        F.when(victim & (F.size("spans") > 0), restamped)
        .otherwise(F.col("spans"))
        .alias("spans"),
    )
    out_dir = tempfile.mkdtemp(prefix="bench_skew_")
    try:
        t0 = time.time()
        run_extraction(
            spark, skewed, out_dir, run_group="skew", num_partitions=CPUS * 2
        )
        wall = round(time.time() - t0, 3)
        audit = read_audit(spark, out_dir)
        stats = audit.agg(
            F.expr("percentile(spans, 0.5)").alias("med"),
            F.max("spans").alias("mx"),
            F.sum("spans").alias("total"),
            F.count("*").alias("parts"),
        ).collect()[0]
        ratio = round(float(stats.mx) / max(float(stats.med), 1.0), 3)
        print(
            json.dumps(
                {
                    "skew_leg": {
                        "docs": corpus.count(),
                        "fat_docs_pct": 1,
                        "fat_spans": 256,
                        "wall_s": wall,
                        "partitions": int(stats.parts),
                        "total_spans": int(stats.total),
                        "spans_per_part_median": float(stats.med),
                        "spans_per_part_max": int(stats.mx),
                        "max_over_median": ratio,
                    }
                }
            )
        )
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
