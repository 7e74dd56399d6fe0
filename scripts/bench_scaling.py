#!/usr/bin/env python3
"""Two-cluster-size scaling evidence (BASELINE.json north_rule).

No real cluster exists in this sandbox, so the ≥0.8 N→4N scaling-efficiency
criterion is evidenced by running the *identical* extraction job at
local[8] and local[32] on the same materialized SF corpus (driver
instruction). Each parallelism level runs in a fresh JVM via spark-submit
so executor-thread counts are honest.

Prints one JSON line and (with --update-baseline) rewrites the measured
section of BASELINE.md.

Efficiency = (throughput_4N / throughput_N) / 4.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N, N4 = 8, 32
RUNS = int(os.environ.get("SPARK_GRAFT_SCALING_RUNS", "2"))

_JOB = r"""
import json, shutil, sys, tempfile, time
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession
spark = (SparkSession.builder.appName("scaling-bench")
         .master("local[{cores}]")
         .config("spark.sql.shuffle.partitions", "{cores}")
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.sql.execution.arrow.pyspark.enabled", "true")
         .config("spark.driver.memory", "8g")
         .config("spark.ui.enabled", "false")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from ocr_search_spark.pipeline import extract_documents
corpus = spark.read.parquet({corpus!r})
out = tempfile.mkdtemp(prefix="scal_")
t0 = time.monotonic()
extract_documents(corpus, num_partitions={parts}).write.mode("overwrite").parquet(out)
elapsed = time.monotonic() - t0
n = spark.read.parquet(out).count()
shutil.rmtree(out, ignore_errors=True)
print("SCALING_RESULT " + json.dumps({{"cores": {cores}, "sec": round(elapsed, 3), "docs": n}}))
spark.stop()
"""


def run_level(cores: int, corpus: str, partitions: int) -> dict:
    with tempfile.NamedTemporaryFile("w", suffix=".py", delete=False) as f:
        f.write(_JOB.format(repo=REPO, cores=cores, corpus=corpus, parts=partitions))
        path = f.name
    try:
        out = subprocess.run(
            [sys.executable, path], capture_output=True, text=True, timeout=1200
        )
        for line in out.stdout.splitlines():
            if line.startswith("SCALING_RESULT "):
                return json.loads(line[len("SCALING_RESULT "):])
        raise RuntimeError(f"no result line; stderr tail: {out.stderr[-2000:]}")
    finally:
        os.unlink(path)


def main() -> None:
    sys.path.insert(0, REPO)
    from bench import ensure_corpus
    from ocr_search_spark.session import get_spark

    spark = get_spark("scaling-prep", cores=N4)
    spark.sparkContext.setLogLevel("ERROR")
    corpus = ensure_corpus(spark, SF_DIR)
    spark.stop()

    # identical job & partitioning at both levels; best-of-RUNS per level
    partitions = N4 * 2
    results = {}
    for cores in (N, N4):
        best = None
        for _ in range(RUNS):
            r = run_level(cores, corpus, partitions)
            if best is None or r["sec"] < best["sec"]:
                best = r
        best["docs_per_sec"] = round(best["docs"] / best["sec"], 1)
        results[cores] = best

    eff = (results[N4]["docs_per_sec"] / results[N]["docs_per_sec"]) / (N4 / N)
    summary = {
        "sf_dir": SF_DIR,
        "partitions": partitions,
        f"local[{N}]": results[N],
        f"local[{N4}]": results[N4],
        "speedup": round(results[N4]["docs_per_sec"] / results[N]["docs_per_sec"], 3),
        "scaling_efficiency": round(eff, 3),
        "criterion": ">=0.8",
        "pass": eff >= 0.8,
    }
    print(json.dumps(summary))

    if "--update-baseline" in sys.argv:
        update_baseline(summary)


def update_baseline(s: dict) -> None:
    path = os.path.join(REPO, "BASELINE.md")
    marker = "## Measured scaling evidence"
    block = f"""{marker}

Two-parallelism-level evidence for the N→4N criterion (no real cluster in
this sandbox — driver instruction): identical extraction job (scan →
salt/shuffle → vectorized extraction → parquet write), same input
({s['sf_dir']} interleaved corpus), same partitioning ({s['partitions']}
salt partitions), fresh JVM per level, best of {RUNS} runs.

| parallelism | wall sec | docs | docs/sec |
|---|---|---|---|
| local[{N}] | {s[f'local[{N}]']['sec']} | {s[f'local[{N}]']['docs']} | {s[f'local[{N}]']['docs_per_sec']} |
| local[{N4}] | {s[f'local[{N4}]']['sec']} | {s[f'local[{N4}]']['docs']} | {s[f'local[{N4}]']['docs_per_sec']} |

Speedup {N}→{N4} cores: **{s['speedup']}×** (ideal 4×) →
scaling efficiency **{s['scaling_efficiency']}** (criterion ≥ 0.8: {'PASS' if s['pass'] else 'FAIL'}).
"""
    text = open(path).read()
    if marker in text:
        text = text[: text.index(marker)] + block
    else:
        text = text.rstrip() + "\n\n" + block
    open(path, "w").write(text)
    print(f"BASELINE.md updated")


if __name__ == "__main__":
    main()
