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


if __name__ == "__main__":
    main()
