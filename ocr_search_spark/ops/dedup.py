"""Deduplication operators: exact, MinHash+LSH, n-gram Jaccard, SimHash.

Scale design: the only quadratic operator (``jaccard_pairs_exact``) exists
for validation and oracle checks; the production path is
MinHash signatures → LSH band buckets → exact Jaccard only on candidate
pairs — shuffle cost O(n·bands), never O(n²).

Hashes are md5-based so every computation is reproducible in any engine
(the DuckDB oracles recompute them bit-identically).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..search.analysis import tokens_expr


def _shingles(col, k: int = 3):
    """Distinct k-token shingles of a text column."""
    toks = tokens_expr(col)
    n = F.size(toks)
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(n - k + 1, F.lit(0))),
            lambda i: F.concat_ws(" ", F.slice(toks, i, k)),
        )
    )


def exact_dedup_groups(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact dedup via content-hash groupBy (map-side combinable).

    Returns (fingerprint, n_dups, keeper_id): keeper = min id; rows with
    n_dups > 1 are duplicate clusters.
    """
    return (
        df.select(
            F.md5(F.encode(F.col(text_col), "utf-8")).alias("fingerprint"),
            F.col(id_col).alias("id"),
        )
        .groupBy("fingerprint")
        .agg(F.count("*").alias("n_dups"), F.min("id").alias("keeper_id"))
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_hashes: int = 8,
    shingle_k: int = 3,
) -> DataFrame:
    """MinHash signature per document.

    Hash family i = md5(i || ':' || shingle); the signature component is the
    lexicographic min — equivalent to a random permutation min under md5's
    uniformity, and bit-reproducible across engines. Documents with no
    shingles get NULL components (filtered by LSH).
    """
    sh = _shingles(F.col(text_col), shingle_k)

    def hasher(prefix: str):
        # NB: must be a 1-arg lambda — pyspark treats 2-arg HOF lambdas as
        # (element, index) and would inject the array index.
        return lambda s: F.md5(F.encode(F.concat(F.lit(prefix), s), "utf-8"))

    cols = [F.col(id_col).alias("id")]
    for i in range(n_hashes):
        cols.append(F.array_min(F.transform(sh, hasher(f"{i}:"))).alias(f"mh{i}"))
    return df.select(*cols)


def lsh_candidate_pairs(
    signatures: DataFrame, n_hashes: int = 8, band_size: int = 2
) -> DataFrame:
    """LSH banding: docs sharing any band bucket become candidate pairs.

    Shuffle = one groupBy per run on (band_idx, band_key); self-join happens
    only within buckets. Returns distinct (a_id, b_id) with a_id < b_id.
    """
    bands = []
    for b in range(0, n_hashes, band_size):
        key = F.md5(
            F.encode(
                F.concat_ws("|", *[F.col(f"mh{i}") for i in range(b, b + band_size)]),
                "utf-8",
            )
        )
        bands.append(
            signatures.filter(F.col(f"mh{b}").isNotNull()).select(
                F.lit(b).alias("band"), key.alias("bucket"), F.col("id")
            )
        )
    all_bands = bands[0]
    for other in bands[1:]:
        all_bands = all_bands.unionByName(other)
    left = all_bands.alias("l")
    right = all_bands.alias("r")
    return (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .select(F.col("l.id").alias("a_id"), F.col("r.id").alias("b_id"))
        .distinct()
    )


def jaccard_pairs_exact(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.5,
    shingle_k: int = 3,
) -> DataFrame:
    """All-pairs n-gram Jaccard ≥ threshold (quadratic — validation scale).

    Returns (a_id, b_id, inter, union) with integer set sizes so the
    similarity is exactly reproducible; production callers should feed
    :func:`lsh_candidate_pairs` output instead of a cross join.
    """
    sh = df.select(F.col(id_col).alias("id"), _shingles(F.col(text_col), shingle_k).alias("sh"))
    a, b = sh.alias("a"), sh.alias("b")
    pairs = a.join(b, F.col("a.id") < F.col("b.id"))
    inter = F.size(F.array_intersect(F.col("a.sh"), F.col("b.sh")))
    union = F.size(F.array_union(F.col("a.sh"), F.col("b.sh")))
    return (
        pairs.select(
            F.col("a.id").alias("a_id"),
            F.col("b.id").alias("b_id"),
            inter.alias("inter"),
            union.alias("union"),
        )
        .filter((F.col("union") > 0) & (F.col("inter") >= F.col("union") * threshold))
    )


def simhash_expr(col, bits: int = 32):
    """SimHash of a text column over 32-bit token hashes.

    Token hash = first 8 hex chars of md5 (engine-portable); each bit
    position is voted +1/-1 by every distinct token; the sign vector forms
    the fingerprint. Pure higher-order-function expression.
    """
    toks = F.array_distinct(tokens_expr(col))
    hashed = F.transform(
        toks,
        lambda t: F.conv(F.substring(F.md5(F.encode(t, "utf-8")), 1, 8), 16, 10).cast("long"),
    )

    def voter(bit_pos: int):
        # 2-arg aggregate merge lambda; bit_pos captured via closure factory
        return lambda acc, h: acc + F.when(
            F.shiftright(h, bit_pos).bitwiseAND(F.lit(1)) == 1, 1
        ).otherwise(-1)

    acc = None
    for b in range(bits):
        vote = F.aggregate(hashed, F.lit(0), voter(b))
        bit = F.when(vote > 0, F.lit(2**b).cast("long")).otherwise(F.lit(0).cast("long"))
        acc = bit if acc is None else acc + bit
    return F.when(F.size(toks) > 0, acc).otherwise(F.lit(0).cast("long"))
