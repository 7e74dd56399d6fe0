"""Text-analysis operators for large-scale training-data pipelines.

All pure built-in column expressions (JVM-side, codegen'd): language id,
quality scoring, token counting, document fingerprinting. Designed to run
in the same scan as extraction output — no extra shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..search.analysis import tokens_expr

#: BPE-ish pre-tokenizer: letter runs | digit runs | punctuation runs —
#: the GPT-2-style split shape, RE2- and Java-regex-portable
BPE_ISH_PATTERN = r"[a-zа-яё]+|[0-9]+|[^a-zа-яё0-9\s]+"

#: tiny per-language stopword signatures for the n-gram/stopword heuristic
LANG_STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is"],
    "ru": ["и", "в", "не", "на", "что", "с", "по"],
    "de": ["der", "die", "das", "und", "nicht", "ist"],
    "es": ["el", "la", "de", "que", "y", "en"],
    "fr": ["le", "la", "de", "et", "les", "des"],
}


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def token_count_expr(col: Column | str) -> Column:
    """Whitespace+punct token count (BPE-ish regex splitter)."""
    return F.size(tokens_expr(_col(col)))


def lang_id_expr(col: Column | str) -> Column:
    """Heuristic language id: Cyrillic ratio first, then stopword votes.

    Returns a language code string; 'und' when nothing matches.
    """
    c = _col(col)
    toks = tokens_expr(c)
    cyr = F.length(F.regexp_replace(c, "[^а-яёА-ЯЁ]", ""))
    votes = {
        lang: F.size(
            F.array_intersect(F.array_distinct(toks), F.array(*[F.lit(w) for w in words]))
        )
        for lang, words in LANG_STOPWORDS.items()
    }
    best = F.greatest(*votes.values())
    expr = F.when(cyr * 2 > F.length(c), F.lit("ru"))
    # deterministic tie-break: first language (dict order) with the max votes
    cond = None
    for lang in LANG_STOPWORDS:
        branch = (votes[lang] == best) & (best > 0)
        cond = F.when(branch, F.lit(lang)) if cond is None else cond.when(branch, F.lit(lang))
    return expr.otherwise(cond.otherwise(F.lit("und")))


def quality_metrics(col: Column | str) -> dict[str, Column]:
    """Length / punctuation / stopword-ratio quality signals.

    Returns named expressions; compose with ``df.select(**)`` or
    ``withColumns``. Ratios are int-count pairs where cross-engine float
    determinism matters (numerator, denominator), plus rounded floats.
    """
    c = _col(col)
    toks = tokens_expr(c)
    n_chars = F.length(c)
    n_tokens = F.size(toks)
    n_punct = F.length(F.regexp_replace(c, "[^.,;:!?]", ""))
    en_stop = F.array(*[F.lit(w) for w in LANG_STOPWORDS["en"]])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(en_stop, t)))
    mean_word_len = F.when(
        n_tokens > 0,
        F.round(
            F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
            / n_tokens,
            4,
        ),
    ).otherwise(F.lit(0.0))
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "n_punct": n_punct,
        "n_stopwords": n_stop,
        "mean_word_len": mean_word_len,
        "stopword_ratio": F.when(n_tokens > 0, F.round(n_stop / n_tokens, 4)).otherwise(
            F.lit(0.0)
        ),
    }


def fingerprint_expr(col: Column | str) -> Column:
    """Exact-content fingerprint: md5 of the text (engine-portable)."""
    return F.md5(F.encode(_col(col), "utf-8"))


def rolling_fingerprints_expr(col: Column | str, window: int = 8) -> Column:
    """Rolling-hash document fingerprints: md5 over each ``window``-token
    shingle — the winnowing-style input set (min-sampled by callers).

    Inline/test form: prefer :func:`winnow_fingerprints` in pipelines (its
    staged projections keep the HOF lambdas on attributes)."""
    toks = tokens_expr(_col(col))
    n = F.size(toks)
    return F.transform(
        F.sequence(F.lit(1), F.greatest(n - window + 1, F.lit(0))),
        lambda i: F.md5(F.encode(F.concat_ws(" ", F.slice(toks, i, window)), "utf-8")),
    )


def whitespace_count_expr(col: Column | str) -> Column:
    """Plain whitespace token count (the cheap n_tokens estimate)."""
    return F.size(F.filter(F.split(_col(col), r"\s+"), lambda t: t != ""))


def bpe_ish_count_expr(col: Column | str) -> Column:
    """BPE-ish pre-tokenizer count: letter/digit/punct runs over the lowered
    text — the tokenizer-budget estimate a training pipeline bins on."""
    return F.size(F.regexp_extract_all(F.lower(_col(col)), F.lit(BPE_ISH_PATTERN), 0))


def winnow_fingerprints(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_k: int = 3,
    window: int = 4,
) -> DataFrame:
    """MOSS-style winnowing fingerprints: positional k-token shingle hashes
    → minimum of every ``window`` consecutive hashes → distinct set.

    The winnowing guarantee: any shared token run of length ≥ window +
    shingle_k − 1 contributes at least one common fingerprint, so
    fingerprint overlap detects partial/contained duplication that
    whole-document hashing misses — at a fixed ~2/(window+1) sampling rate.

    Returns (id, fingerprints array<string>). Plan shape: three staged
    projections (tokens → positional shingles → hashes → window minima) so
    every interpreted HOF lambda reads attributes, never re-evaluates an
    outer expression tree per element (see ops.dedup._shingles_of_tokens).
    Hashes are md5 hex strings (lexicographic minima — engine-portable,
    DuckDB-oracle-checkable).
    """
    toked = df.select(
        F.col(id_col).alias("id"), tokens_expr(F.col(text_col)).alias("toks")
    )
    n = F.size(F.col("toks"))

    def shingle_at(i):
        return F.concat_ws(
            " ", *[F.element_at(F.col("toks"), i + j) for j in range(shingle_k)]
        )

    sh = toked.select(
        "id",
        F.when(
            n >= shingle_k,
            F.transform(F.sequence(F.lit(1), n - shingle_k + 1), shingle_at),
        )
        .otherwise(F.array().cast("array<string>"))
        .alias("sh"),
    )
    hashed = sh.select(
        "id",
        F.size("sh").alias("n_sh"),  # second sh reference: keeps projection
        F.transform("sh", lambda s: F.md5(F.encode(s, "utf-8"))).alias("hs"),
    )
    n_sh = F.col("n_sh")
    minima = F.transform(
        F.sequence(F.lit(1), n_sh - window + 1),
        lambda j: F.array_min(F.slice(F.col("hs"), j, window)),
    )
    fps = F.when(n_sh >= window, F.array_distinct(minima)).otherwise(
        F.array_distinct(F.col("hs"))
    )
    return hashed.select("id", fps.alias("fingerprints"))


def repetition_signals(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-style repetition quality signals, integer-exact:

    * ``n_bigrams``        — total token bigrams,
    * ``top_bigram_count`` — occurrences of the most frequent bigram,
    * ``n_distinct_tok`` / ``n_tokens`` — type/token counts.

    A doc is repetition-spam when ``top_bigram_count / n_bigrams`` is high
    (looped boilerplate) or type/token ratio is very low. Counts are left
    as integer pairs so the gate thresholds and the cross-engine oracle are
    exact. Staged projections (tokens → bigrams → counts) keep HOF lambdas
    on attributes; the mode count is O(distinct × n) per doc — fine for the
    ≤10³-token documents this targets (cap upstream for pathological rows).
    """
    toked = df.select(
        F.col(id_col).alias("id"), tokens_expr(F.col(text_col)).alias("toks")
    )
    n = F.size(F.col("toks"))
    bigram_at = lambda i: F.concat_ws(  # noqa: E731
        " ", F.element_at(F.col("toks"), i), F.element_at(F.col("toks"), i + 1)
    )
    bg = toked.select(
        "id",
        n.alias("n_tokens"),
        F.size(F.array_distinct("toks")).alias("n_distinct_tok"),
        F.when(n >= 2, F.transform(F.sequence(F.lit(1), n - 1), bigram_at))
        .otherwise(F.array().cast("array<string>"))
        .alias("bg"),
    )
    top = F.array_max(
        F.transform(
            F.array_distinct(F.col("bg")),
            lambda x: F.size(F.filter(F.col("bg"), lambda y: y == x)),
        )
    )
    return bg.select(
        "id",
        "n_tokens",
        "n_distinct_tok",
        F.size("bg").alias("n_bigrams"),
        F.coalesce(top, F.lit(0)).alias("top_bigram_count"),
    )


def winnow_partial_dup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_shared: int = 2,
    shingle_k: int = 3,
    window: int = 4,
) -> DataFrame:
    """Partial/contained-duplication candidates: document pairs sharing at
    least ``min_shared`` winnowing fingerprints — catches a plagiarized
    paragraph inside an otherwise-different document, which whole-document
    MinHash misses (Jaccard dilutes with document length).

    Scale shape: the fingerprint posting join — explode fingerprints, hash
    self-join on fp (shuffle keyed on fingerprint, O(matches) work), count
    shared per pair. Common-substring boilerplate creates hot fingerprints;
    cap them upstream like LSH buckets (drop fps with document frequency
    above a boilerplate threshold) before the join at production scale.

    Returns (a_id, b_id, shared) with a_id < b_id.
    """
    w = winnow_fingerprints(df, id_col, text_col, shingle_k, window)
    flat = w.select("id", F.explode("fingerprints").alias("fp"))
    a, b = flat.alias("a"), flat.alias("b")
    return (
        a.join(b, (F.col("a.fp") == F.col("b.fp")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("a_id"), F.col("b.id").alias("b_id"))
        .agg(F.count("*").alias("shared"))
        .filter(F.col("shared") >= min_shared)
    )
