"""Streaming twin of ``ops.relational.range_join``: a watermarked
stream-stream interval join.

Batch ``range_join`` buckets time to turn the interval predicate into an
equi join; a stream can't bucket an unbounded axis, but Structured
Streaming has a native operator for exactly this shape — a stream-stream
inner join whose ON clause carries an event-time range. The time bounds
do double duty: they are the join semantics AND the state-retention
contract (Spark derives, from ``r.ts ∈ [l.ts - W, l.ts]`` plus the two
watermarks, how long each side's rows can still find a partner, and
evicts state past that horizon). State is O(arrival rate × (W +
watermark delay)) per side, not O(stream length) — the property that
makes the operator viable on an unbounded event stream.

Semantics match the batch operator exactly (backward window, inclusive
both ends, inner): the equivalence test feeds the same rows through both
and compares result sets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join_stream(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    lookback_s: int = 60,
    watermark: str = "1 hour",
    suffix: str = "_r",
) -> DataFrame:
    """All (left, right) pairs with the same ``on`` key and
    ``left_ts - lookback_s <= right_ts <= left_ts``, over two streaming
    DataFrames. Output columns mirror the batch ``range_join``: key +
    left columns + right columns with ``suffix``.

    Both inputs must carry event-time columns; ``watermark`` bounds how
    late a row may arrive and therefore how much join state is retained
    beyond the ``lookback_s`` window itself.
    """
    lookback_s = int(lookback_s)
    if lookback_s <= 0:
        raise ValueError(
            "lookback_s must be a positive whole number of seconds "
            "(same contract as the batch range_join)"
        )
    l2 = left.withWatermark(left_ts, watermark).alias("__l")
    r_cols = [
        F.col(c).alias(f"__r_{c}") for c in right.columns
    ]
    r2 = (
        right.select(*r_cols)
        .withWatermark(f"__r_{right_ts}", watermark)
        .alias("__r")
    )
    lt = F.col(f"__l.{left_ts}")
    rt = F.col(f"__r.__r_{right_ts}")
    cond = (
        (F.col(f"__l.{on}") == F.col(f"__r.__r_{on}"))
        & (rt <= lt)
        & (rt >= lt - F.expr(f"INTERVAL {int(lookback_s)} SECONDS"))
    )
    joined = l2.join(r2, cond)
    out_cols = [F.col(f"__l.{on}").alias(on)] + [
        F.col(f"__l.{c}").alias(c) for c in left.columns if c != on
    ] + [
        F.col(f"__r.__r_{c}").alias(c + suffix)
        for c in right.columns
        if c != on
    ]
    return joined.select(*out_cols)
