"""The search entry point (reference: app/search.py:10-99, web path
app/web/routes.py:40-65) rebuilt over a Spark DataFrame.

Expected input: a *documents* DataFrame with columns
``doc_id`` (string), ``content`` (string) and optionally
``created_at`` (timestamp), ``email`` (string), ``path_origin`` (string).

Plan shape (scale notes):

* predicates (date range / ILIKE / FTS) are plain Catalyst filters —
  pushed down and partition-pruned on a real table scan;
* for interactive workloads at 10^12 docs the per-query tokenize is the
  wrong plan — :func:`build_postings` materializes the inverted postings
  table once at extraction time (the Spark analogue of the tsvector trigger,
  alembic 0001_init.py:36-53) and :func:`search_documents` accepts it to
  run the FTS predicate as a broadcast semi-join on query terms instead of
  re-tokenizing the corpus;
* ranking/ordering are scalar expressions + ``orderBy().limit(k)`` → Spark
  executes TakeOrderedAndProject, never a full sort.

Reference bugs fixed (documented in SURVEY.md appendix): limit/offset are
actually applied (search.py:71-87 declared but ignored them) and the empty
query returns the intended "latest 10" (search.py:29-31 placeholder).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .analysis import (
    fts_match,
    rank_expr,
    snippet_expr,
    tokens_expr,
    trigram_sim_udf,
    with_search_columns,
)

#: defaults from search.py:41-42
DEFAULT_FROM = "2000-01-01 00:00:00"
DEFAULT_TO = "2100-01-01 00:00:00"


def build_postings(docs: DataFrame, id_col: str = "doc_id", text_col: str = "content") -> DataFrame:
    """Inverted postings table (term, doc_id, positions, tf).

    Materialized compute-once-on-write, like the reference's tsvector
    trigger; written bucketed/partitioned by term prefix in a real
    deployment so a term lookup prunes to one bucket.
    """
    tok = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(tokens_expr(text_col)).alias("pos", "term"),
    )
    return tok.groupBy("term", "doc_id").agg(
        F.count("*").alias("tf"), F.collect_list("pos").alias("positions")
    )


def _apply_common_filters(df: DataFrame, ocr_user, ocr_from, ocr_to) -> DataFrame:
    """Date-range + ILIKE predicates (Q2/Q3 — search.py:53-55)."""
    if "created_at" in df.columns:
        df = df.filter(
            F.col("created_at").between(
                F.lit(ocr_from or DEFAULT_FROM).cast("timestamp"),
                F.lit(ocr_to or DEFAULT_TO).cast("timestamp"),
            )
        )
    if ocr_user and "email" in df.columns:
        df = df.filter(F.col("email").ilike(f"%{ocr_user}%"))
    return df


def search_documents(
    docs: DataFrame,
    q: str | None,
    ocr_user: str | None = None,
    ocr_from: str | None = None,
    ocr_to: str | None = None,
    limit: int = 25,
    offset: int = 0,
    postings: DataFrame | None = None,
    rank_mode: str = "simple",
) -> dict:
    """Full search flow; returns ``{"total": int, "items": DataFrame}``.

    Mirrors ``search_documents`` (search.py:10-99): empty query → total
    count + latest 10; otherwise AND-match all terms, rank by
    ``GREATEST(rank, sim)`` desc (search.py:81), project
    (doc_id, snippet, rank, sim), paginate.

    ``rank_mode`` selects the FTS rank term: ``"simple"`` (matched/total,
    the engine-portable default), ``"cd"`` (cover-density proximity — the
    closest analogue of the reference's ts_rank_cd, search.py:77) or
    ``"bm25"`` (Okapi BM25; unbounded scale, so it dominates the trigram
    ``sim`` term in the GREATEST combination — use when term relevance
    should outrank fuzzy similarity).
    """
    q = (q or "").strip()

    if not (q or ocr_user or ocr_from or ocr_to):
        total = docs.count()
        order = [F.col("created_at").desc()] if "created_at" in docs.columns else []
        items = (
            docs.orderBy(*order, F.col("doc_id"))
            .limit(10)
            .select("doc_id", F.substring("content", 1, 800).alias("snippet"))
        )
        return {"total": total, "items": items}

    terms = [t for t in q.lower().split() if t]
    filtered = _apply_common_filters(docs, ocr_user, ocr_from, ocr_to)

    if terms:
        if postings is not None:
            # scale path: semi-join doc ids that match ALL terms
            term_df = postings.sparkSession.createDataFrame(
                [(t,) for t in set(terms)], "term string"
            )
            matched = (
                postings.join(F.broadcast(term_df), "term", "inner")
                .groupBy("doc_id")
                .agg(F.count_distinct("term").alias("nt"))
                .filter(F.col("nt") == len(set(terms)))
                .select("doc_id")
            )
            filtered = filtered.join(matched, "doc_id", "left_semi")
        else:
            filtered = filtered.filter(fts_match(tokens_expr("content"), terms))

    total = filtered.count()

    if rank_mode != "simple" and terms:
        from .ranking import bm25_scores, cover_density_rank

        if rank_mode == "cd":
            ranks = cover_density_rank(
                filtered, terms, id_col="doc_id", text_col="content"
            ).select("doc_id", F.col("rank_cd").alias("__rank"))
        elif rank_mode == "bm25":
            ranks = bm25_scores(
                filtered, terms, id_col="doc_id", text_col="content"
            ).select("doc_id", F.col("bm25").alias("__rank"))
        else:
            raise ValueError(f"unknown rank_mode: {rank_mode!r}")
        base = filtered.join(ranks, "doc_id", "left")
        rank_col = F.coalesce(F.col("__rank"), F.lit(0.0))
    else:
        base = filtered
        rank_col = None  # from materialized toks below

    # materialize toks first — inline split() inside HOF lambdas would
    # re-evaluate per array element; and score trigram similarity with the
    # Arrow-batched UDF: document-length content makes the interpreted
    # gram-array transform ~100× slower (see trigram_sim_udf)
    base = with_search_columns(base, "content")
    if rank_col is None:
        rank_col = rank_expr(F.col("toks"), terms)
    scored = base.select(
        "doc_id",
        snippet_expr("content", terms[0] if terms else q).alias("snippet"),
        F.round(rank_col, 6).alias("rank"),
        F.round(trigram_sim_udf(q)(F.col("content")), 6).alias("sim"),
    ).withColumn("score", F.greatest("rank", "sim"))

    ordered = scored.orderBy(F.col("score").desc(), F.col("doc_id"))
    if offset:
        w = Window.orderBy(F.col("score").desc(), F.col("doc_id"))
        ordered = (
            ordered.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") > offset)
            .drop("_rn")
        )
    items = ordered.limit(limit).drop("score")
    return {"total": total, "items": items}
