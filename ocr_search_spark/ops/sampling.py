"""Deterministic sampling & split assignment for training-data pipelines.

Random sampling is useless at 10^12 rows if it isn't *repeatable*: the same
document must land in the same split on every run, on any cluster, so that
train/val/test never leak into each other across reprocessings. Both
operators here key off ``md5(salt || id)`` — a pure column expression
(JVM-side, no RNG state, no shuffle), identical in Spark and DuckDB, so the
assignment is reproducible anywhere and oracle-checkable bit-for-bit.

The bucket is the first 8 hex chars of the digest taken mod ``buckets``
(default 10,000 → 0.01% rate granularity). md5's avalanche makes buckets
uniform regardless of id structure (sequential ids, URL-shaped ids, ...).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BUCKETS = 10_000


def hash_bucket(id_col: Column | str, salt: str = "", buckets: int = BUCKETS) -> Column:
    """Stable bucket in [0, buckets) from md5(salt || id)."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    h = F.md5(F.concat(F.lit(salt), c.cast("string")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % buckets


def deterministic_sample(
    df: DataFrame, rate: float, id_col: str = "doc_id", salt: str = ""
) -> DataFrame:
    """Repeatable ``rate``-fraction sample: keep rows whose hash bucket falls
    below ``rate``. Same salt + same ids → the same sample, every run; a
    different salt draws an independent sample. Pure filter — pushes into
    the scan, no shuffle, no RNG."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    return df.filter(hash_bucket(id_col, salt) < int(round(rate * BUCKETS)))


def hash_split(
    df: DataFrame,
    weights: dict[str, float],
    id_col: str = "doc_id",
    salt: str = "split",
) -> DataFrame:
    """Assign each row a split label by hash range (e.g. train/val/test).

    ``weights`` maps label → fraction (must sum to 1 within rounding); the
    cumulative ranges partition the bucket space, so the splits are exactly
    disjoint and exhaustive — a document can never change split between
    runs or leak into two splits. Adds a ``split`` column.
    """
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"weights must sum to 1, got {total}")
    bucket = hash_bucket(id_col, salt)
    expr = None
    hi = 0
    items = list(weights.items())
    for label, w in items[:-1]:
        hi += int(round(w * BUCKETS))
        expr = (
            F.when(bucket < hi, F.lit(label))
            if expr is None
            else expr.when(bucket < hi, F.lit(label))
        )
    last_label = items[-1][0]
    expr = F.lit(last_label) if expr is None else expr.otherwise(F.lit(last_label))
    return df.withColumn("split", expr)
