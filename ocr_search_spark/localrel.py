"""JVM-local literal relations for small driver-side tables.

``spark.createDataFrame`` frames are Python-RDD-backed: every job whose
plan contains one pays a Python-worker scan stage just to produce a
handful of literal rows. A ``VALUES`` relation is a JVM-local
LocalRelation — free to scan, free to broadcast (the
``similarity.centroids_to_df`` convention, shared here for string
lists: query-term tables, blocklists, badword lists).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def strings_df(spark, values, col: str = "value") -> DataFrame:
    """One-column string table as a JVM-local VALUES relation.

    ``values`` must be non-empty (SQL VALUES cannot be empty — callers
    already guard their empty-list cases). Strings are embedded as SQL
    literals with quote/backslash escaping; order is preserved.
    """
    vals = list(values)
    if not vals:
        raise ValueError("strings_df needs at least one value")

    def lit(s: str) -> str:
        return "'" + str(s).replace("\\", "\\\\").replace("'", "\\'") + "'"

    rows = ", ".join(f"({lit(v)})" for v in vals)
    return spark.sql(f"SELECT * FROM VALUES {rows} AS t({col})")
