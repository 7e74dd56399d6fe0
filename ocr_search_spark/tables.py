"""Table IO abstraction: parquet paths now, Iceberg tables when a catalog
is configured.

The north_rule targets Iceberg tables; this sandbox has no Iceberg runtime
jar, so the engine runs on directory-addressed parquet with the same
append/overwrite discipline. Every write in the pipeline goes through this
module, so switching to Iceberg is a config change, not a refactor:

    export SPARK_GRAFT_TABLE_FORMAT=iceberg
    # plus spark.sql.catalog.<cat> configs and iceberg-spark-runtime on the
    # classpath; identifiers then resolve as <cat>.<db>.<name> instead of
    # filesystem paths.

Iceberg specifics the parquet mode emulates:

* append = new files under the directory (Iceberg: new snapshot);
* overwrite = full replace (Iceberg: REPLACE snapshot);
* the checkpoint ledger gives batch resumability (Iceberg's snapshot
  isolation would additionally make each group commit atomic at the
  catalog level — the WAP/branch pattern).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_FORMAT = os.environ.get("SPARK_GRAFT_TABLE_FORMAT", "parquet")


def write_table(
    df: DataFrame,
    identifier: str,
    mode: str = "append",
    partition_by: tuple[str, ...] | None = None,
) -> None:
    """Write ``df`` to a table identifier (path in parquet mode).

    ``partition_by`` lays rows out under ``col=value/`` directories in
    parquet mode. In Iceberg mode the table's partition spec is declared at
    create time: ``createOrReplace`` applies it via ``partitionedBy``;
    ``append`` relies on the existing spec (the catalog routes rows)."""
    if TABLE_FORMAT == "iceberg":
        writer = df.writeTo(identifier)
        if mode == "append":
            writer.append()
        elif mode == "overwrite":
            if partition_by:
                from pyspark.sql import functions as F

                writer = writer.partitionedBy(*[F.col(c) for c in partition_by])
            writer.createOrReplace()
        else:
            raise ValueError(f"unsupported mode {mode!r}")
        return
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(identifier)


def read_table(spark: SparkSession, identifier: str) -> DataFrame:
    if TABLE_FORMAT == "iceberg":
        return spark.read.table(identifier)
    return spark.read.parquet(identifier)


def table_exists(spark: SparkSession, identifier: str) -> bool:
    if TABLE_FORMAT == "iceberg":
        return spark.catalog.tableExists(identifier)
    try:
        spark.read.parquet(identifier).schema
        return True
    except Exception:
        return False
