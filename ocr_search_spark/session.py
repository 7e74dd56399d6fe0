"""SparkSession factory with the engine's standard tuning.

Settings chosen for the 100 TB design point, scaled to sandbox local mode:

* AQE on — runtime shuffle-partition coalescing and skew-join splitting;
* Arrow on, bounded batches — vectorized pandas UDF transfer with
  per-batch memory capped (the analogue of the reference's raster clamps,
  pdf_fast.py:37-40);
* shuffle partitions sized to cores (local mode); on a real cluster this is
  superseded by AQE's target advisory size.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "ocr-search-spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = max(cores, 8)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cores}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        # InferFiltersFromGenerate is a pessimization for this engine: every
        # exploded array here (tokens, shingles, fingerprints, spans) is an
        # EXPENSIVE computed column, and the inferred `size(arr) > 0` filter
        # gets predicate-pushed through the producing projections, inlining
        # the whole expression tree into a scan-level filter — measured
        # catastrophic (winnowing: 41 tokenizer copies, re-evaluated per
        # array element under interpreted HOF semantics → a 1 s job became
        # 50+ min). Skipping empty arrays in the Generate is worth far less
        # than evaluating the producer twice.
        .config(
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
        )
    )
    if os.path.isdir("/dev/shm"):
        # local-mode analogue of NVMe shuffle volumes: spill/shuffle to tmpfs
        # and skip compression (shuffle fits memory; CPU better spent on
        # kernels). On a real cluster this maps to fast local disks +
        # spark.shuffle.compress tuned to the network/disk ratio.
        builder = builder.config("spark.local.dir", "/dev/shm/spark-local").config(
            "spark.shuffle.compress", "false"
        )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
