"""Column-expression building blocks for the search layer.

Everything here is built-in ``pyspark.sql.functions`` / higher-order array
functions — JVM-side, whole-stage-codegen-friendly; no Python UDFs.

Reference semantics being replicated:

* tokenization ≈ ``to_tsvector('simple', content)`` (alembic 0001_init.py:
  31-53): lowercase, split on non-word chars — the 'simple' config does no
  stemming, matching a plain regex split;
* FTS match ≈ ``search_vector @@ websearch_to_tsquery(:q)`` (search.py:51-52)
  under AND semantics: every query term must appear;
* rank ≈ ``ts_rank_cd`` (search.py:77) approximated as matched-terms /
  total-terms (a deterministic, engine-portable stand-in for cover density);
* sim ≈ pg_trgm ``similarity(content, :q)`` (search.py:78): Jaccard over
  3-gram sets;
* snippet ≈ ``ts_headline(... MaxFragments=3, MinWords=3 ...)``
  (search.py:76): a window around the first term hit with ``<b>`` marks.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

#: token delimiter — complement of [a-zа-яё0-9_] after lowercasing
TOKEN_PATTERN = "[^a-zа-яё0-9_]+"


def tokens_expr(col: Column | str) -> Column:
    """Lowercased word tokens of a text column (empty strings filtered)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.lower(c), TOKEN_PATTERN), lambda t: t != "")


def trigrams_expr(col: Column | str) -> Column:
    """Distinct character 3-grams of the lowercased text."""
    c = F.col(col) if isinstance(col, str) else col
    lc = F.lower(c)
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.length(lc) - 2, F.lit(0))),
            lambda i: F.substring(lc, i, 3),
        )
    )


def trigrams_of_lc(lc: Column | str) -> Column:
    """Distinct 3-grams from a *pre-lowered, materialized* text column.

    PLAN-SHAPE INVARIANT: ``lc`` must be an attribute produced by an earlier
    projection (e.g. via :func:`with_search_columns`) — an inline
    ``lower(text)`` here would be re-evaluated once per array element by the
    interpreted transform (measured ~10× slower at 5k docs).
    """
    c = F.col(lc) if isinstance(lc, str) else lc
    # guard len < 3: greatest(len-2, 0) would make sequence(1, 0) — a
    # DESCENDING [1, 0] in Spark — and emit a bogus short gram the DuckDB
    # twin (range(1, greatest(L-1, 1)) = []) does not
    return F.when(F.length(c) < 3, F.array().cast("array<string>")).otherwise(
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.length(c) - 2),
                lambda i: F.substring(c, i, 3),
            )
        )
    )


def with_search_columns(df, text_col: str = "text", grams: bool = False):
    """Materialize ``toks`` (and optionally ``lc`` + ``grams``) columns.

    Separate projections keep tokenization/lowering evaluated once per row;
    every downstream HOF lambda then reads plain attributes.
    """
    out = df.withColumn("toks", tokens_expr(text_col)).withColumn(
        "lc", F.lower(F.col(text_col))
    )
    if grams:
        out = out.withColumn("grams", trigrams_of_lc("lc"))
    return out


def _terms_lit(terms: list[str]) -> Column:
    return F.array(*[F.lit(t.lower()) for t in terms])


def fts_match(tokens: Column, terms: list[str]) -> Column:
    """AND-semantics full-text predicate: all ``terms`` appear as tokens."""
    return F.size(F.array_except(_terms_lit(terms), tokens)) == 0


def rank_expr(tokens: Column, terms: list[str]) -> Column:
    """Matched-terms / total-terms in [0, 1] (ts_rank_cd stand-in)."""
    n = len(terms) or 1
    return (
        F.size(F.array_intersect(F.array_distinct(tokens), _terms_lit(terms)))
        / F.lit(float(n))
    )


def trigram_sim_from_grams(grams: Column | str, query: str) -> Column:
    """pg_trgm similarity from a *materialized* ``grams`` array column.

    PLAN-SHAPE: use this (with :func:`with_search_columns`) whenever the
    text is more than a few tokens — :func:`trigram_sim_expr` inlines the
    gram construction, and interpreted HOF lambdas re-evaluate the inline
    ``lower(text)`` once per array element (quadratic in text length).
    """
    g = F.col(grams) if isinstance(grams, str) else grams
    q = query.lower()
    q_grams = sorted({q[i : i + 3] for i in range(max(0, len(q) - 2))})
    q_lit = F.array(*[F.lit(x) for x in q_grams]) if q_grams else F.array().cast("array<string>")
    inter = F.size(F.array_intersect(g, q_lit))
    union = F.size(F.array_union(g, q_lit))
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


def trigram_sim_udf(query: str):
    """Arrow-batched pandas-UDF trigram similarity for DOCUMENT-LENGTH text.

    The pure-column forms build the gram array with an interpreted
    higher-order ``transform`` — fine for short strings, but ~15 µs per
    element means a 1k-char document costs ~15 ms per scoring expression
    (measured: an 11 s stall on a 312-doc result set). Python set
    operations over an Arrow batch are ~100× faster at this shape, and a
    vectorized pandas UDF is exactly the sanctioned escape hatch. Returns
    identical values (integer intersection/union then one double divide).
    """
    from pyspark.sql.functions import pandas_udf

    q = query.lower()
    q_grams = {q[i : i + 3] for i in range(max(0, len(q) - 2))}

    @pandas_udf("double")
    def sim(content: pd.Series) -> pd.Series:
        def one(t):
            if not t:
                return 0.0
            lc = t.lower()
            g = {lc[i : i + 3] for i in range(max(0, len(lc) - 2))}
            union = len(g | q_grams)
            return (len(g & q_grams) / union) if union else 0.0

        return content.map(one)

    return sim


def trigram_sim_expr(col: Column | str, query: str) -> Column:
    """pg_trgm-style similarity: Jaccard of 3-gram sets vs ``query``.

    Inline form — fine for short strings; for document-length text use
    :func:`trigram_sim_from_grams` over ``with_search_columns`` output
    (see its plan-shape note).
    """
    grams = trigrams_expr(col)
    q = query.lower()
    q_grams = sorted({q[i : i + 3] for i in range(max(0, len(q) - 2))})
    q_lit = F.array(*[F.lit(g) for g in q_grams]) if q_grams else F.array().cast("array<string>")
    inter = F.size(F.array_intersect(grams, q_lit))
    union = F.size(F.array_union(grams, q_lit))
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


def snippet_expr(
    col: Column | str, term: str, width: int = 30, mark: bool = True
) -> Column:
    """Fragment of ``width`` chars around the first hit of ``term``.

    Emulates ``ts_headline`` (search.py:76) with a single fragment; the hit
    is wrapped in ``<b>`` marks when ``mark`` (the reference renders
    snippet_is_html=True items, search.py:94-98).
    """
    import re

    c = F.col(col) if isinstance(col, str) else col
    pos = F.locate(term.lower(), F.lower(c))  # 1-based; 0 = no hit
    start = F.greatest(pos - width, F.lit(1))
    frag = F.substring(c, start, F.lit(2 * width + len(term)))
    if mark:
        # re.escape: ``term`` may be a raw user query (negation-only queries
        # have no positive term to fall back on) — unescaped metacharacters
        # like '(' would crash regexp_replace at runtime
        frag = F.regexp_replace(frag, f"(?i)({re.escape(term)})", "<b>$1</b>")
    return F.when(pos > 0, frag).otherwise(F.lit(""))


def snippet_fragments_expr(
    text_col: str,
    lc_col: str,
    term: str,
    max_fragments: int = 3,
    width: int = 30,
) -> Column:
    """``ts_headline``-style multi-fragment snippet: up to ``max_fragments``
    fragments of ``width`` chars around consecutive hits, joined ``' ... '``,
    each hit wrapped in ``<b>`` (MaxFragments=3 in search.py:76).

    ``text_col``/``lc_col`` are COLUMN NAMES (``lc_col`` must hold the
    pre-lowered text, materialized by a prior projection); the hit chain is
    built from 3-arg ``locate`` so the identical expression shape runs on
    external SQL engines for oracle checks. ``term`` must be a lowercase
    word (no regex/quote metacharacters).
    """
    t = term.lower()
    if not t.isalnum():
        raise ValueError(f"term must be alphanumeric, got {term!r}")
    L = len(t)
    flen = 2 * width + L
    frag_cols = []
    for k in range(1, max_fragments + 1):
        # case-insensitive mark preserving original case ($1), mirroring
        # ts_headline and the sibling snippet_expr — hits are located on the
        # lowered column, so a mixed-case hit must still get its <b> marks
        frag_cols.append(
            f"CASE WHEN __sp{k} > 0 THEN "
            f"regexp_replace(substring({text_col}, greatest(__sp{k} - {width}, 1), {flen}),"
            f" '(?i)({t})', '<b>$1</b>') END"
        )
    # positions must be materialized as columns first — the caller does:
    #   df.select(..., *snippet_hit_positions(...)) then this join expr
    return F.array_join(
        F.filter(
            F.array(*[F.expr(e) for e in frag_cols]),
            lambda x: x.isNotNull(),
        ),
        " ... ",
    )


def snippet_hit_positions(
    lc_col: str, term: str, max_fragments: int = 3
) -> list[tuple[str, Column]]:
    """The ``__sp1..__spN`` hit-position columns that
    :func:`snippet_fragments_expr` consumes. Each references the previous,
    so add them with chained ``withColumn`` (successive projections) —
    aliases created in the same select are not visible to siblings."""
    t = term.lower()
    L = len(t)
    cols: list[tuple[str, Column]] = [("__sp1", F.expr(f"locate('{t}', {lc_col})"))]
    for k in range(1, max_fragments):
        cols.append(
            (
                f"__sp{k + 1}",
                F.expr(
                    f"CASE WHEN __sp{k} > 0 THEN locate('{t}', {lc_col}, __sp{k} + {L}) "
                    f"ELSE 0 END"
                ),
            )
        )
    return cols


def with_snippet_fragments(
    df,
    text_col: str,
    term: str,
    out_col: str = "snippet",
    max_fragments: int = 3,
    width: int = 30,
):
    """Convenience: materialize lowered text + hit positions (chained
    projections) and append the joined multi-fragment snippet column."""
    d = df.withColumn("__lc", F.lower(F.col(text_col)))
    for name, expr in snippet_hit_positions("__lc", term, max_fragments):
        d = d.withColumn(name, expr)
    return d.withColumn(
        out_col,
        snippet_fragments_expr(text_col, "__lc", term, max_fragments, width),
    )
