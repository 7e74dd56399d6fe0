"""Deterministic cardinality sketches: bounded-shuffle distinct
estimation and set-overlap estimation over massive key spaces.

At 100 TB, exact ``COUNT(DISTINCT token)`` per group shuffles every
distinct value; Spark's built-in ``approx_count_distinct`` (HLL++)
bounds that state but its sketch is engine-specific — useless where the
result must be reproducible bit-for-bit across engines (the repo-wide
oracle discipline; no reference analogue — a first-class
training-pipeline analytics operator like ops/dsir.py).

This module uses the classic HASH-THRESHOLD (bottom-level Flajolet /
"adaptive sampling", the fixed-level special case of KMV) sketch
instead: keep a value iff its 32-bit md5 prefix falls below
``2^(32-sample_bits)`` — a deterministic 1/2^b uniform sample of the
DISTINCT value space (duplicates of one value hash identically, so the
sample decision is per-VALUE, not per-row). Then

    distinct_estimate = distinct_sampled * 2^sample_bits

* exact integer arithmetic end to end — both engines compute the same
  md5, the same threshold decision, the same counts;
* the filter runs BEFORE the distinct shuffle, so shuffle volume is
  n_distinct / 2^b rows — the operator's whole point at scale;
* sketches are mergeable: the union of two groups' samples is the
  sample of the union (same hash, same threshold), so partial
  aggregates compose — and set overlap (Jaccard) computed ON the
  samples estimates the true overlap, since a uniform sample of the
  union hits intersection elements in proportion.

Standard error is ~1/sqrt(distinct_sampled); pick ``sample_bits`` so
the expected sample is 10^3–10^4 (relative error of a few percent)
and the shuffle stays tiny at any corpus size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: 32-bit hash space size
_HASH_SPACE = 1 << 32


def hash32_expr(col: Column) -> Column:
    """First 32 bits of md5(value) as a BIGINT in [0, 2^32) — the
    engine-portable uniform hash every sketch decision is made on
    (the ops.sampling.hash_bucket md5 convention)."""
    return F.conv(
        F.substring(F.md5(F.encode(col.cast("string"), "utf-8")), 1, 8), 16, 10
    ).cast("long")


def distinct_sample(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    sample_bits: int,
) -> DataFrame:
    """The deterministic distinct-value sample: one row per (keys,
    value) whose hash clears the threshold — ``(keys..., __h)`` where
    ``__h`` is the value's 32-bit hash. The threshold filter runs
    before the distinct, so only ~n_distinct/2^b rows ever shuffle."""
    if not 0 <= sample_bits <= 31:
        raise ValueError(f"sample_bits must be in [0, 31]: {sample_bits}")
    cutoff = _HASH_SPACE >> sample_bits
    return (
        df.select(*keys, hash32_expr(F.col(value_col)).alias("__h"))
        .filter(F.col("__h") < F.lit(cutoff))
        .distinct()
    )


def distinct_estimate(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    sample_bits: int = 4,
) -> DataFrame:
    """Per-group distinct-cardinality estimate with bounded shuffle:
    ``(keys..., n_sampled, n_est)`` where ``n_est = n_sampled *
    2^sample_bits``. Exact integers, engine-reproducible; relative
    error ~1/sqrt(n_sampled). ``sample_bits=0`` degrades gracefully to
    the exact distinct count."""
    return (
        distinct_sample(df, keys, value_col, sample_bits)
        .groupBy(*keys)
        .agg(F.count("*").alias("n_sampled"))
        .select(
            *keys,
            "n_sampled",
            (F.col("n_sampled") * F.lit(1 << sample_bits)).alias("n_est"),
        )
    )


def sampled_jaccard(
    df: DataFrame,
    set_col: str,
    value_col: str,
    sample_bits: int = 4,
) -> DataFrame:
    """Pairwise set-overlap estimate between every pair of sets, on the
    shared distinct-value sample: ``(set_a, set_b, n_inter, n_union,
    jaccard_pm)`` for set_a < set_b, with ``jaccard_pm`` the Jaccard
    index in exact per-mille integer units (``1000*n_inter/n_union``,
    floor division — no floats cross an engine boundary).

    Because every set's sample is drawn by the SAME value hash and
    threshold, an element of the intersection is either sampled in both
    sets or in neither — so intersection/union counted on the samples
    is an unbiased estimate of the true overlap. The self-join runs on
    the sampled table (~n_distinct/2^b rows), never the corpus. Pairs
    whose SAMPLED intersection is empty are omitted (inner join — an
    estimated-zero overlap produces no row, it does not prove true
    disjointness).

    The sampled table feeds FOUR plan branches (both self-join sides
    and both size lookups), so it is ``localCheckpoint``-ed: without
    lineage truncation each branch would re-run the upstream corpus
    scan + explode — 4 full scans at 100 TB for a report whose working
    set is n_distinct/2^b rows (the ops.dedup CC discipline; same
    recompute-on-executor-loss caveat, trivial here because the
    materialized sample is tiny)."""
    s = distinct_sample(df, [set_col], value_col, sample_bits).localCheckpoint()
    a = s.select(F.col(set_col).alias("set_a"), "__h")
    b = s.select(F.col(set_col).alias("set_b"), "__h")
    inter = (
        a.join(b, "__h")
        .filter(F.col("set_a") < F.col("set_b"))
        .groupBy("set_a", "set_b")
        .agg(F.count("*").alias("n_inter"))
    )
    sizes = s.groupBy(set_col).agg(F.count("*").alias("n"))
    return (
        inter.join(
            F.broadcast(sizes.select(F.col(set_col).alias("set_a"), F.col("n").alias("na"))),
            "set_a",
        )
        .join(
            F.broadcast(sizes.select(F.col(set_col).alias("set_b"), F.col("n").alias("nb"))),
            "set_b",
        )
        .select(
            "set_a",
            "set_b",
            "n_inter",
            (F.col("na") + F.col("nb") - F.col("n_inter")).alias("n_union"),
            # floor of a correctly-rounded IEEE quotient of exact
            # integers is engine-identical; a bare cast is NOT (Spark
            # truncates, DuckDB rounds)
            F.floor(
                (F.lit(1000) * F.col("n_inter"))
                / (F.col("na") + F.col("nb") - F.col("n_inter"))
            )
            .cast("long")
            .alias("jaccard_pm"),
        )
    )


def heaps_law(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    fracs: tuple[float, ...] = (0.01, 0.1, 1.0),
    salt: str = "heaps",
) -> DataFrame:
    """Vocabulary growth curve (Heaps'-law audit): for each NESTED
    deterministic document sample — frac f keeps docs whose md5 bucket
    falls below f·BUCKETS, so the 1% corpus IS a subset of the 10%
    corpus — the exact doc/token/distinct-word counts. Fitting
    V = K·nᵝ to these rows is the standard vocabulary forecast for
    tokenizer-vocab and hash-width sizing (ops.text_analysis.bpe_train
    assumes ~10^8 words at 100 TB by exactly this law; this operator
    measures the exponent on YOUR corpus instead of assuming it).

    Returns (frac_ppm, docs, tokens, distinct_words) ordered by
    frac_ppm — exact integers end to end, no estimator variance.

    Scale shape: ONE corpus scan. Each doc gets its smallest qualifying
    tier (a literal CASE over the md5 bucket — the ops.sampling
    convention, so tier-i docs are the same documents
    ``deterministic_sample(fracs[i])`` draws); docs/tokens reduce per
    tier into |fracs| rows. Distinct words do NOT shuffle once per
    frac: one word-keyed map-side-combinable shuffle computes each
    word's MINIMUM tier, a vocab-sized aggregate counts words per
    first-seen tier, and a |fracs|-row running sum converts "first seen
    at tier i" into "distinct at frac ≥ i" — nesting makes the
    cumulative counts exact. No UDF; the word table is the same
    vocab-sized asset bpe_train shuffles.
    """
    from ..search.analysis import tokens_expr
    from .sampling import BUCKETS, hash_bucket

    fr = [float(f) for f in fracs]
    if not fr or any(not 0.0 < f <= 1.0 for f in fr) or sorted(set(fr)) != fr:
        raise ValueError(
            f"fracs must be strictly increasing, each in (0, 1]: {fracs}"
        )
    cuts = [int(round(f * BUCKETS)) for f in fr]
    # a frac below the 1/BUCKETS hash granularity rounds to cut 0 (its
    # sample row would silently read all-zero), and two nearby fracs can
    # round to the SAME cut (a fake nesting level) — both would skew a
    # V = K·nᵝ fit, so they are errors, not empty samples
    if cuts[0] < 1 or sorted(set(cuts)) != cuts:
        raise ValueError(
            f"fracs must stay distinct at the 1/{BUCKETS} hash "
            f"granularity: {fracs} round to buckets {cuts}"
        )
    bucket = hash_bucket(id_col, salt)
    tier = F.when(bucket < cuts[0], F.lit(0))
    for i, c in enumerate(cuts[1:], start=1):
        tier = tier.when(bucket < c, F.lit(i))
    toked = df.select(
        tier.alias("__tier"), tokens_expr(F.col(text_col)).alias("__toks")
    ).filter(F.col("__tier").isNotNull())
    per_tier = toked.groupBy("__tier").agg(
        F.count("*").alias("__docs"),
        F.sum(F.size("__toks")).alias("__tokens"),
    )
    first_seen = (
        toked.select("__tier", F.explode("__toks").alias("w"))
        .groupBy("w")
        .agg(F.min("__tier").alias("__tier"))
        .groupBy("__tier")
        .agg(F.count("*").alias("__words"))
    )
    # JVM-local VALUES relation — no Python-RDD scan per pass (r6)
    base = df.sparkSession.sql(
        "SELECT * FROM VALUES "
        + ", ".join(
            f"({i}, CAST({int(round(f * 1_000_000))} AS BIGINT))"
            for i, f in enumerate(fr)
        )
        + " AS t(__tier, frac_ppm)"
    )
    from pyspark.sql.window import Window

    # row-bound: one row per half-bit tier (<= 64 rows by construction)
    w = Window.orderBy("__tier").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        base.join(per_tier, "__tier", "left")
        .join(first_seen, "__tier", "left")
        .select(
            "frac_ppm",
            F.sum(F.coalesce("__docs", F.lit(0))).over(w).alias("docs"),
            F.sum(F.coalesce("__tokens", F.lit(0))).over(w).alias("tokens"),
            F.sum(F.coalesce("__words", F.lit(0)))
            .over(w)
            .alias("distinct_words"),
        )
        .orderBy("frac_ppm")
    )


def _hb_wide(c):
    """floor(2·log₂ c) for 1 ≤ c < 2^63 WITHOUT squaring:
    2L + [c ≥ T_L] with L = length(bin(c)) - 1 and T_L =
    ceil(sqrt(2^(2L+1))) — the 63 thresholds are exact integers
    (Python isqrt) embedded as one array literal indexed by L. The
    ops.dsir ``_hb`` identity squares its argument and therefore caps
    at 2^31; head-word counts at 100 TB (~10^11–10^12) need this wide
    form. Agrees with ``_hb`` bit-for-bit on the shared range
    (tested)."""
    import math

    ts = [math.isqrt((1 << (2 * lv + 1)) - 1) + 1 for lv in range(63)]
    lcol = F.length(F.bin(c)) - F.lit(1)
    t = F.element_at(
        F.array(*[F.lit(v) for v in ts]), (lcol + F.lit(1)).cast("int")
    )
    return (lcol * 2 + F.when(c >= t, F.lit(1)).otherwise(F.lit(0))).cast(
        "int"
    )


def zipf_spectrum(
    df: DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """Token frequency-of-frequencies on the half-bit lattice — the
    Zipf/Good-Turing spectrum: for each half-bit band
    ``hb(c) = floor(2·log₂ c)`` of word frequency c, how many distinct
    words live there and how much corpus mass they carry. Returns
    (hb_band, n_words, tokens, min_count, max_count) ordered by band —
    band 0 is the hapax legomena (c = 1), the low bands are the
    Good-Turing smoothing mass and the OOV-rate forecast, the top bands
    are the stop-word head. Exact integers end to end via the WIDE
    half-bit identity (:func:`_hb_wide` — threshold table, no
    squaring), so the spectrum is engine-reproducible at any count a
    BIGINT can hold: a 100 TB head word at c ≈ 10^12 bands exactly,
    where the squaring form of the identity would overflow at 2^31.

    Scale shape: ONE corpus tokenize/explode into the map-side-
    combinable word-count shuffle (the same vocab-sized table
    bpe_train and heaps_law build), then a second combinable aggregate
    over ≤ ~64 half-bit keys. Nothing vocab-sized ever reaches the
    driver.
    """
    from ..search.analysis import tokens_expr

    vocab = (
        df.select(F.explode(tokens_expr(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("c"))
    )
    return (
        vocab.groupBy(_hb_wide(F.col("c")).alias("hb_band"))
        .agg(
            F.count("*").alias("n_words"),
            F.sum("c").alias("tokens"),
            F.min("c").alias("min_count"),
            F.max("c").alias("max_count"),
        )
        .orderBy("hb_band")
    )
