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
    """Stable bucket in [0, buckets) from md5(salt || id). Null ids hash
    as the empty string, so every row — including null-id rows — gets a
    deterministic bucket and no sampling/split operator can silently
    change the corpus row count through null propagation."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    h = F.md5(F.concat(F.lit(salt), F.coalesce(c.cast("string"), F.lit(""))))
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


def topk_per_group(
    df: DataFrame,
    group_col: str,
    order_col: str,
    k: int,
    descending: bool = True,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Best ``k`` rows per group (e.g. the k highest-quality docs per
    language/domain for corpus mixing) — the distributed group-wise
    top-k: one shuffle on the group key, a rank inside each partition,
    no global sort and no collect. Ties on ``order_col`` are broken by
    ``tiebreak_col`` (ascending; default the group ordering is made
    total by the caller's id) so results are deterministic and
    oracle-checkable.

    At scale the only hazard is a hot group (all rows one language):
    that is the same skew class as any keyed shuffle — AQE skew handling
    or pre-filtering applies; the operator itself adds no amplification.
    """
    from pyspark.sql import Window

    oc = F.col(order_col).desc() if descending else F.col(order_col).asc()
    order = [oc] + ([F.col(tiebreak_col).asc()] if tiebreak_col else [])
    w = Window.partitionBy(group_col).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= int(k))
        .drop("__rn")
    )


def stratified_sample(
    df: DataFrame,
    group_col: str,
    rates: dict[str, float],
    default_rate: float = 1.0,
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Per-group deterministic sampling — the language/domain rebalancing
    step of a mixing recipe (e.g. downsample English to 30%, keep
    low-resource languages whole). ``rates`` maps group value → keep
    fraction; groups not listed keep ``default_rate``.

    Same machinery as ``deterministic_sample`` (md5 hash-bucket filter:
    repeatable, no RNG, no shuffle — the predicate pushes into the scan),
    with the threshold chosen per row from the group column via a literal
    CASE chain (rates maps are human-curated and small, so the expression
    stays broadcast-free and codegen'd).
    """
    for g, r in rates.items():
        if not 0.0 <= r <= 1.0:
            raise ValueError(f"rate for {g!r} must be in [0, 1], got {r}")
    if not 0.0 <= default_rate <= 1.0:
        raise ValueError(f"default_rate must be in [0, 1], got {default_rate}")
    thresh = F.lit(int(round(default_rate * BUCKETS)))
    for g, r in rates.items():
        thresh = F.when(
            F.col(group_col) == g, F.lit(int(round(r * BUCKETS)))
        ).otherwise(thresh)
    return df.filter(hash_bucket(id_col, salt) < thresh)


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_tokens: int = 512,
    overlap: int = 64,
) -> DataFrame:
    """Split documents into fixed-size token windows with overlap — the
    context-window chunking step of LM training-sequence prep (and of
    retrieval indexing). Chunk ``k`` covers tokens
    ``[k·stride, k·stride + chunk_tokens)`` with
    ``stride = chunk_tokens - overlap``; every token lands in at least
    one chunk and consecutive chunks share ``overlap`` tokens. Documents
    shorter than one window (including empty ones) yield exactly one
    chunk.

    Output: (id, chunk_idx, chunk_text, n_tokens) — ``chunk_text`` is
    the single-space re-join of the window's tokens (tokenized form, the
    standard LM-prep convention; original whitespace is not preserved).

    Pure codegen: tokenize → ``sequence`` over chunk starts → explode →
    ``slice``/``array_join``. No UDF, no shuffle — a per-row generate
    with bounded fan-out ``≈ n_tokens / stride``, so it composes with
    pushed-down filters and parallelism follows the scan.
    """
    if chunk_tokens <= 0:
        raise ValueError("chunk_tokens must be positive")
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("overlap must be in [0, chunk_tokens)")
    from ..search.analysis import tokens_expr

    stride = chunk_tokens - overlap
    toked = df.select(
        F.col(id_col).alias("id"), tokens_expr(F.col(text_col)).alias("__toks")
    )
    n = F.size("__toks")
    n_chunks = F.greatest(
        F.lit(1), F.ceil((n - F.lit(overlap)) / F.lit(stride)).cast("int")
    )
    chunks = toked.select(
        "id",
        "__toks",
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx"),
    )
    window = F.slice(
        F.col("__toks"), F.col("chunk_idx") * stride + 1, F.lit(chunk_tokens)
    )
    return chunks.select(
        "id",
        "chunk_idx",
        F.array_join(window, " ").alias("chunk_text"),
        F.size(window).alias("n_tokens"),
    )


def temperature_rates(
    df: DataFrame,
    group_col: str,
    alpha: float = 0.5,
) -> DataFrame:
    """Per-group keep-thresholds for temperature-``alpha`` rebalancing —
    the T5/UniMax-style mixing rule: resample so group sizes become
    proportional to ``count^alpha`` (``alpha=1`` keeps the natural
    distribution, ``alpha=0`` flattens to uniform). Downsample-only: the
    scale is anchored so the SMALLEST group keeps rate 1.0 and every
    other group keeps ``(c_min / c_g)^(1-alpha)``.

    Returns (group, __c, __thresh) where ``__thresh`` is the hash-bucket
    cutoff in [0, BUCKETS]. The rate arithmetic is a division plus
    ``sqrt`` when ``alpha == 0.5`` (IEEE-754 correctly rounded — bit-
    identical across engines, so the oracle twin is hash-exact) and
    ``pow`` otherwise (documented: last-ulp divergence across libm
    implementations can move a threshold by one bucket).

    Cost: one map-side-combinable count per group + a singleton min —
    the result is O(groups) and meant for ``F.broadcast``.
    """
    if not 0.0 <= alpha <= 1.0:
        raise ValueError(f"alpha must be in [0, 1], got {alpha}")
    from pyspark.sql import Window

    counts = df.groupBy(group_col).agg(F.count("*").alias("__c"))
    # global min as a window over the ALREADY-AGGREGATED counts table
    # (O(groups) rows to one partition) — a separate agg + crossJoin
    # would put the corpus-wide count subtree into the plan twice and
    # cost a second full scan at production scale
    cmin = F.min("__c").over(Window.partitionBy())
    ratio = cmin.cast("double") / F.col("__c")
    rate = F.sqrt(ratio) if alpha == 0.5 else F.pow(ratio, F.lit(1.0 - alpha))
    return counts.select(
        group_col,
        "__c",
        F.least(F.lit(BUCKETS), F.floor(rate * BUCKETS))
        .cast("long")
        .alias("__thresh"),
    )


def temperature_rebalance(
    df: DataFrame,
    group_col: str,
    alpha: float = 0.5,
    id_col: str = "doc_id",
    salt: str = "temp",
) -> DataFrame:
    """Temperature-``alpha`` corpus rebalancing over ``group_col``
    (language/domain mixing): keep each row iff its deterministic hash
    bucket falls under its group's ``temperature_rates`` threshold, so
    surviving group sizes are ∝ ``count^alpha`` (in expectation over the
    md5 buckets) without any RNG.

    Plan shape: the O(groups) rates table is broadcast-joined onto the
    corpus — the big side never shuffles and the filter stays a codegen'd
    integer comparison. Same determinism contract as
    ``deterministic_sample``: same ids + same salt → same corpus, any
    cluster, any run.
    """
    rates = temperature_rates(df, group_col, alpha)
    return (
        df.join(F.broadcast(rates), group_col)
        .filter(hash_bucket(id_col, salt) < F.col("__thresh"))
        .drop("__c", "__thresh")
    )


def unimax_rates(
    df: DataFrame,
    group_col: str,
    budget_rows: int,
) -> DataFrame:
    """Water-filling allocation of a total row budget across groups —
    the UniMax-style mixing rule (budget spread as uniformly as the
    group sizes allow, downsample-only): every group smaller than the
    water level keeps ALL its rows; the remaining budget divides evenly
    (integer) among the larger groups, which are capped at that level.

    Returns (group, __c, __t, __thresh): ``__t`` is the integer target
    row count and ``__thresh`` the hash-bucket cutoff
    ``(__t · BUCKETS) div __c``. The water level is found with window
    functions over the O(groups) counts table — groups sorted ascending
    by size, a group is taken whole iff its size ≤ the integer-divided
    remaining-budget share at its rank, and the first not-whole rank
    fixes the cap for every larger group. Pure integer arithmetic, so
    the oracle twin is hash-exact; one count aggregation, no second
    corpus scan, no collect.
    """
    if budget_rows <= 0:
        raise ValueError(f"budget_rows must be positive, got {budget_rows}")
    from pyspark.sql import Window

    counts = df.groupBy(group_col).agg(F.count("*").alias("__c"))
    # row-bound: input is one row per GROUP (O(groups), never corpus-scaled)
    w = Window.orderBy(F.col("__c").asc(), F.col(group_col).asc())
    wall = Window.partitionBy()
    ranked = counts.select(
        group_col,
        "__c",
        F.row_number().over(w).alias("__i"),
        F.sum("__c").over(w).alias("__p"),  # cumulative incl. current
        F.count("*").over(wall).alias("__n"),
    )
    # remaining budget before rank i is B - (P_i - c_i); its even share
    # over the i..n tail is the water-level candidate at rank i. The
    # full test is valid at every rank because fullness is prefix-closed
    # (shares strictly decrease past the first non-full rank, so no
    # later rank can test full — see the test's brute-force check).
    share = F.expr("(%d - (__p - __c)) div (__n - __i + 1)" % int(budget_rows))
    ranked = ranked.withColumn("__full", F.col("__c") <= share).withColumn(
        "__share", share
    )
    # cap = share at the FIRST non-full rank; since non-full shares
    # strictly decrease with rank, that is their MAX (null when every
    # group is full, i.e. budget >= corpus — then the when() below never
    # reaches it)
    cap = F.max(F.when(~F.col("__full"), F.col("__share"))).over(wall)
    t = F.when(F.col("__full"), F.col("__c")).otherwise(cap)
    return ranked.select(
        group_col,
        "__c",
        t.alias("__t"),
        F.expr("(__t * %d) div __c" % BUCKETS).alias("__thresh"),
    )


def unimax_rebalance(
    df: DataFrame,
    group_col: str,
    budget_rows: int,
    id_col: str = "doc_id",
    salt: str = "unimax",
) -> DataFrame:
    """Budgeted UniMax rebalancing over ``group_col``: keep each row iff
    its deterministic hash bucket falls under its group's water-filled
    threshold, so surviving group sizes approximate the integer targets
    of :func:`unimax_rates` (small groups whole, large groups capped at
    a common level) without any RNG. Same broadcast-rates plan shape as
    :func:`temperature_rebalance`."""
    rates = unimax_rates(df, group_col, budget_rows)
    return (
        df.join(F.broadcast(rates), group_col)
        .filter(hash_bucket(id_col, salt) < F.col("__thresh"))
        .drop("__c", "__t", "__thresh")
    )


def pack_shards(
    df: DataFrame,
    id_col: str,
    token_count_col: str,
    target_tokens: int,
    n_groups: int = 1024,
    salt: str = "pack",
) -> DataFrame:
    """Assign documents to training shards of ~ ``target_tokens`` each
    (the corpus-assembly step before tokenized-sequence writing).

    Global greedy packing is inherently sequential; the distributed form
    packs independently inside ``n_groups`` deterministic hash groups:
    within a group, documents are ordered by id, a running token total is
    taken, and the shard index is the running total's bin by starting
    offset (``floor((cum - n_tokens) / target)``) — consecutive docs
    share a shard until the budget fills, and an oversized doc simply
    spans its own shard. One shuffle (the group window); parallelism =
    ``n_groups``, per-group state bounded by the group's rows. Returns
    (id, tokens, shard_group, shard_idx) — ``(shard_group, shard_idx)``
    is the shard key. Deterministic: same ids, same shards, every run.

    Null ``token_count_col`` values are rejected at runtime
    (``raise_error``): a null would make ``__cum - tokens`` null and the
    row would silently fall out of every shard, breaking the determinism
    contract — count your tokens (or ``coalesce`` to 0 explicitly
    upstream) before packing.
    """
    if target_tokens <= 0:
        raise ValueError("target_tokens must be positive")
    from pyspark.sql import Window

    grp = hash_bucket(id_col, salt, buckets=n_groups)
    tokens = F.col(token_count_col).cast("long")
    tokens = F.when(
        tokens.isNull(),
        F.raise_error(
            F.lit(
                f"pack_shards: null {token_count_col} — token counts must "
                "be non-null (coalesce upstream if 0 is intended)"
            )
        ).cast("long"),
    ).otherwise(tokens)
    w = (
        Window.partitionBy("shard_group")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.select(
            F.col(id_col),
            tokens.alias("tokens"),
            grp.alias("shard_group"),
        )
        .withColumn("__cum", F.sum("tokens").over(w))
        .select(
            id_col,
            "tokens",
            "shard_group",
            F.floor(
                (F.col("__cum") - F.col("tokens")) / F.lit(int(target_tokens))
            ).alias("shard_idx"),
        )
    )


def pack_sequences(
    df: DataFrame,
    id_col: str,
    token_count_col: str,
    seq_len: int,
    n_groups: int = 1024,
    salt: str = "pack",
) -> DataFrame:
    """Pack documents into EXACT fixed-length training sequences of
    ``seq_len`` tokens, splitting documents across sequence boundaries —
    the concat-and-chunk step that turns a token-counted corpus into the
    (sequence, position) layout an LM pretraining loader consumes.
    ``pack_shards`` above bins whole documents into ~shard-sized buckets;
    this operator additionally splits the stream at exact ``seq_len``
    boundaries, so every sequence except a group's last is exactly full.

    Within each of ``n_groups`` deterministic hash groups, documents are
    concatenated in id order; document i occupies the half-open token
    interval [cum_i - n_i, cum_i) of the group's stream, and sequence k
    covers [k*seq_len, (k+1)*seq_len). A document therefore lands in
    sequences ``floor(start/seq_len) .. floor((cum-1)/seq_len)`` — one
    output row per (document, sequence) piece with the document-local
    token sub-range [begin_tok, end_tok) it contributes.

    Output: (id, tokens, shard_group, seq_idx, begin_tok, end_tok).
    Zero-token documents contribute no piece (empty interval) and are
    dropped — count them upstream if they matter; null token counts
    raise (the pack_shards contract).

    Scale shape: ONE shuffle (the group window), per-row generate with
    bounded fan-out ``ceil(n/seq_len) + 1``, integer-exact arithmetic
    throughout. Group-local packing is what makes this distributed: the
    global-concatenation order a single-stream packer needs is
    inherently sequential, while per-group streams pack independently
    and reassemble deterministically — same trade as pack_shards, and at
    1000 executors you raise ``n_groups``, not the per-group state.
    """
    if seq_len <= 0:
        raise ValueError("seq_len must be positive")
    from pyspark.sql import Window

    grp = hash_bucket(id_col, salt, buckets=n_groups)
    tokens = F.col(token_count_col).cast("long")
    tokens = F.when(
        tokens.isNull(),
        F.raise_error(
            F.lit(
                f"pack_sequences: null {token_count_col} — token counts "
                "must be non-null (coalesce upstream if 0 is intended)"
            )
        ).cast("long"),
    ).otherwise(tokens)
    w = (
        Window.partitionBy("shard_group")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    L = int(seq_len)
    staged = (
        df.select(
            F.col(id_col),
            tokens.alias("tokens"),
            grp.alias("shard_group"),
        )
        .withColumn("__cum", F.sum("tokens").over(w))
        .withColumn("__start", F.col("__cum") - F.col("tokens"))
        .filter(F.col("tokens") > 0)
        .withColumn(
            "seq_idx",
            F.explode(
                F.sequence(
                    F.floor(F.col("__start") / L),
                    F.floor((F.col("__cum") - 1) / L),
                )
            ),
        )
    )
    return staged.select(
        id_col,
        "tokens",
        "shard_group",
        "seq_idx",
        F.greatest(F.lit(0), F.col("seq_idx") * L - F.col("__start")).alias(
            "begin_tok"
        ),
        F.least(
            F.col("tokens"), (F.col("seq_idx") + 1) * L - F.col("__start")
        ).alias("end_tok"),
    )


def oversample(
    df: DataFrame,
    group_col: str,
    factors: dict[str, float],
    id_col: str = "doc_id",
    salt: str = "epoch",
) -> DataFrame:
    """Deterministic oversampling by per-group epoch factors — the
    mixing-recipe primitive behind "wikipedia ×3.5, web ×1.0" style
    training mixes (each source repeated a fractional number of epochs).
    Every row of group g is replicated ``floor(f_g)`` times, plus one
    more copy when its hash bucket falls under ``frac(f_g)`` — so the
    EXACT requested expectation is met deterministically (same ids →
    same copies, every run, any partitioning; no RNG state). Groups
    absent from ``factors`` default to 1.0. Factors must be > 0.

    Output: the input columns plus ``copy_idx`` (0-based), so downstream
    shuffles and shard packing see distinct rows per copy (feed
    ``md5(id || copy_idx)`` as the packing key to spread copies across
    shards).

    Scale shape: a literal CASE over the factor map (factors are a
    driver-side recipe, O(groups) and tiny) + one bounded explode —
    fan-out ``ceil(f)`` per row, no shuffle, no join; composes with
    pushed-down filters. The fractional top-up reuses
    :func:`hash_bucket`, so the DuckDB oracle reproduces copy counts
    bit-exactly.
    """
    if not factors:
        raise ValueError("factors must name at least one group")
    for g, f in factors.items():
        if not f > 0:
            raise ValueError(f"factor for {g!r} must be > 0, got {f}")
    fcol = None
    for g, f in factors.items():
        cond = F.col(group_col) == g
        fcol = F.when(cond, F.lit(float(f))) if fcol is None else fcol.when(
            cond, F.lit(float(f))
        )
    fcol = fcol.otherwise(F.lit(1.0))
    whole = F.floor(fcol).cast("long")
    frac_thresh = ((fcol - F.floor(fcol)) * BUCKETS).cast("long")
    extra = F.when(
        hash_bucket(id_col, salt) < frac_thresh, F.lit(1)
    ).otherwise(F.lit(0))
    n_copies = (whole + extra).alias("__n")
    return (
        df.withColumn("__n", n_copies)
        .filter(F.col("__n") > 0)
        .withColumn(
            "copy_idx", F.explode(F.sequence(F.lit(0), F.col("__n") - 1))
        )
        .drop("__n")
    )


def shard_manifest(
    df: DataFrame,
    shard_cols: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    token_count_col: str | None = None,
) -> DataFrame:
    """Data-release manifest: one row per shard with the integrity
    metadata a published training corpus ships alongside its files —
    ``(shard_cols..., n_docs, n_tokens?, min_id, max_id, content_xor)``.

    ``content_xor`` is an ORDER-INDEPENDENT content checksum: the XOR
    of each document's 60-bit digest (first 15 hex chars of
    ``md5(id || ':' || text)`` — 15, not 16, so the BIGINT conversion
    never touches the sign bit and both engines agree exactly). XOR is
    associative/commutative, so the distributed aggregation is
    bit-identical to any serial oracle regardless of partitioning or
    row order — two independently-produced copies of a shard can be
    compared by one 8-byte value without sorting either side. (A
    swapped-id pair or any re-edit flips the digest; XOR's known
    blindness to an even number of IDENTICAL (id, text) rows is
    excluded by upstream exact dedup, and row-count drift is caught by
    ``n_docs``.)

    Null ``id_col``/``text_col`` values are rejected at runtime
    (``raise_error``): ``bit_xor`` silently SKIPS a null digest, so a
    null row would fall out of the checksum while still counting in
    ``n_docs`` — an integrity manifest must fail loudly instead (the
    pack_shards null-guard discipline).

    One map-side-combinable groupBy — the manifest never shuffles more
    than ``n_shards`` rows."""
    raw = F.concat(
        F.col(id_col).cast("string"), F.lit(":"), F.col(text_col)
    )
    raw = F.when(
        raw.isNull(),
        F.raise_error(
            F.lit(
                f"shard_manifest: null {id_col}/{text_col} — a null row "
                "would silently vanish from content_xor"
            )
        ).cast("string"),
    ).otherwise(raw)
    digest = F.conv(F.substring(F.md5(raw), 1, 15), 16, 10).cast("long")
    aggs = [F.count("*").alias("n_docs")]
    if token_count_col is not None:
        aggs.append(
            F.sum(F.col(token_count_col).cast("long")).alias("n_tokens")
        )
    aggs += [
        F.min(id_col).alias("min_id"),
        F.max(id_col).alias("max_id"),
        F.bit_xor(digest).alias("content_xor"),
    ]
    return df.groupBy(*shard_cols).agg(*aggs)


def global_shuffle(
    df: DataFrame,
    id_col: str = "doc_id",
    salt: str = "shuffle",
    prefix_hex: int = 4,
) -> DataFrame:
    """Deterministic global training order: assign every row a dense
    position 0..N-1 in ``md5(salt || id)`` order — the final "shuffle the
    corpus" step before sequence packing / shard writing, without an RNG
    and without a single global sort.

    A naive ``row_number() OVER (ORDER BY hash)`` collapses to ONE
    partition at scale. This is the two-level enumeration instead:

    * level 1 — bucket by the first ``prefix_hex`` hex chars of the
      digest (65,536 buckets at the default). Per-bucket counts are a
      map-side-combinable groupBy; the cumulative-offset window runs
      over that ≤65k-row table only (a driver-scale sort, never the
      corpus), and joins back via broadcast.
    * level 2 — ``row_number`` *within* each bucket, ordered by
      (full digest, id). md5's avalanche makes buckets uniform, so
      per-bucket state is ~N/65k rows regardless of id skew.

    ``position`` is therefore exactly ``row_number() OVER (ORDER BY
    md5(salt||id), id) - 1`` — the oracle's serial form — but computed
    with corpus-sized work spread over 65k independent windows. A new
    ``salt`` draws an independent permutation (epoch reshuffles). To
    materialise the order, ``repartitionByRange(n, "position")`` +
    ``sortWithinPartitions("position")`` and write.

    Null ids are rejected at runtime (``raise_error``): a null would
    hash as NULL, fall to the end of every ordering differently per
    engine, and silently break the permutation contract.
    """
    if not 1 <= prefix_hex <= 8:
        raise ValueError(f"prefix_hex must be in [1, 8], got {prefix_hex}")
    from pyspark.sql import Window

    sid = F.col(id_col).cast("string")
    sid = F.when(
        sid.isNull(),
        F.raise_error(
            F.lit(f"global_shuffle: null {id_col} — ids must be non-null")
        ).cast("string"),
    ).otherwise(sid)
    h = F.md5(F.concat(F.lit(salt), sid))
    base = df.select(
        F.col(id_col),
        h.alias("__h"),
        F.substring(h, 1, prefix_hex).alias("__b"),
    )
    counts = base.groupBy("__b").agg(F.count("*").alias("__n"))
    # row-bound: one row per length bucket (O(buckets), never corpus-scaled)
    w_off = Window.orderBy("__b").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = counts.select(
        "__b",
        F.coalesce(F.sum("__n").over(w_off), F.lit(0)).alias("__off"),
    )
    w_in = Window.partitionBy("__b").orderBy("__h", id_col)
    return base.join(F.broadcast(offsets), "__b").select(
        id_col,
        (F.col("__off") + F.row_number().over(w_in) - 1).alias("position"),
    )


def length_buckets(
    df: DataFrame,
    id_col: str = "doc_id",
    token_count_col: str = "n_tokens",
    batch_size: int = 32,
) -> DataFrame:
    """Length-bucketed batching: group rows into power-of-two token-length
    buckets, then deterministic fixed-size batches within each bucket —
    the standard padding-waste killer for batched tokenization/inference
    (sequences in a batch pad to the batch max, so batching 10-token rows
    with 10k-token rows wastes ~99.9% of the compute).

    ``bucket`` is ``floor(log2(n))`` via the bin-length identity (0- and
    null-token rows land in bucket 0 rather than vanishing); ``batch_idx``
    is the row's ordinal within its bucket (ordered by ``id_col`` for
    determinism) integer-divided by ``batch_size``. (bucket, batch_idx)
    is the batch key; every batch holds ≤ ``batch_size`` rows whose
    lengths are within 2× of each other.

    One shuffle (the per-bucket window); ~60 buckets regardless of corpus
    size, so per-bucket partitions are corpus-sized — for 10^12-row
    corpora sub-bucket the window by a hash group (the ``pack_shards``
    pattern) or feed shards independently; at that scale batches don't
    need global ordinals, only unique keys.

    Output: (id_col, tokens, bucket, batch_idx).
    """
    if batch_size <= 0:
        raise ValueError(f"batch_size must be positive, got {batch_size}")
    from pyspark.sql import Window

    n = F.coalesce(F.col(token_count_col).cast("long"), F.lit(0))
    bucket = F.when(n <= 0, F.lit(0)).otherwise(
        F.length(F.bin(n)) - 1
    )
    w = Window.partitionBy("bucket").orderBy(id_col)
    return (
        df.select(F.col(id_col), n.alias("tokens"), bucket.alias("bucket"))
        .withColumn("__ord", (F.row_number().over(w) - 1).cast("long"))
        .select(
            id_col,
            "tokens",
            "bucket",
            F.expr(f"__ord DIV {int(batch_size)}").alias("batch_idx"),
        )
    )


def weighted_sample(
    df: DataFrame,
    n: int,
    weight_col: str,
    id_col: str = "doc_id",
    salt: str = "wsample",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement — n rows drawn
    with probability proportional to ``weight_col`` (Efraimidis-Spirakis
    A-Res): each row gets priority ``ln(u) / w`` with ``u`` a
    deterministic uniform derived from ``md5(salt || id)``, and the n
    LARGEST priorities win. Same ids + same salt → the same sample every
    run and engine; a different salt draws an independent sample. The
    quality-weighted corpus draw ("sample 1M docs ∝ quality score") that
    plain deterministic_sample (uniform) can't express.

    ``u`` is a half-open lattice uniform ``(bucket + 1) / 10001`` with
    ``bucket = md5-hash % 10000`` — strictly inside (0, 1), so ``ln(u)``
    is finite and the priority is well-defined. Priorities are rounded
    to the 6-dp lattice; ties (possible through rounding) break on the
    id. Rows with null, zero or negative weight are excluded — they have
    zero selection probability in A-Res semantics.

    Returns the sampled rows with their ``__priority`` dropped —
    schema = input schema.

    Scale: a per-row hash + one distributed top-n (TakeOrderedAndProject
    heaps) — no sort of the full corpus, no RNG state, restart-safe.
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n!r}")
    w = F.col(weight_col).cast("double")
    u = (hash_bucket(id_col, salt) + 1).cast("double") / F.lit(10001.0)
    prio = F.round(F.log(u) / w, 6)
    return (
        df.filter(w > 0)
        .withColumn("__priority", prio)
        .orderBy(F.col("__priority").desc(), F.col(id_col))
        .limit(int(n))
        .drop("__priority")
    )
