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
from .analysis import (
    rank_expr,
    snippet_expr,
    tokens_expr,
    trigram_sim_udf,
    with_search_columns,
)
from .websearch import (
    is_plain_and,
    parse_websearch,
    positive_terms,
    token_string_expr,
    websearch_predicate,
)

#: defaults from search.py:41-42
DEFAULT_FROM = "2000-01-01 00:00:00"
DEFAULT_TO = "2100-01-01 00:00:00"

#: stand-in for the reference's ``settings.httpfs`` host (app/search.py:94)
DEFAULT_HTTPFS = "files.local"


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


def phrase_match_postings(postings: DataFrame, words: list[str]) -> DataFrame:
    """doc_ids where ``words`` appear as adjacent tokens, resolved purely
    from the postings positions lists — the ``<->`` (phraseto_tsquery)
    access pattern over the GIN-index analogue: per-term postings are
    filtered (term lookup prunes to one bucket on a term-bucketed table),
    hash-joined on doc_id, and the candidate start positions narrow at
    each step. No document text is touched."""
    if not words:
        raise ValueError("empty phrase")
    cur = postings.filter(F.col("term") == words[0]).select(
        "doc_id", F.col("positions").alias("pos")
    )

    def shifted_in_next(step: int):
        # closure factory: a `lambda p, step=i` would be 2-arg and pyspark
        # binds the SECOND HOF argument to the array index, not the default
        return lambda p: F.array_contains(F.col("pos_next"), p + step)

    for i, w in enumerate(words[1:], start=1):
        nxt = postings.filter(F.col("term") == w).select(
            "doc_id", F.col("positions").alias("pos_next")
        )
        cur = (
            cur.join(nxt, "doc_id")
            .select("doc_id", F.filter("pos", shifted_in_next(i)).alias("pos"))
            .filter(F.size("pos") > 0)
        )
    return cur.select("doc_id")


def websearch_match_postings(
    docs: DataFrame, postings: DataFrame, parsed
) -> DataFrame:
    """Filter ``docs`` under full websearch grammar using only the postings
    table: per-item doc-id sets (term lookup or positional phrase match),
    AND within a group via successive semi-joins, ``-item`` via anti-join,
    OR across groups via doc-id union. Every join is on doc_id; the corpus
    text column is never re-tokenized (the 10^12-doc interactive plan)."""

    def item_ids(item) -> DataFrame:
        if len(item.words) == 1:
            return postings.filter(F.col("term") == item.words[0]).select(
                "doc_id"
            ).distinct()
        return phrase_match_postings(postings, list(item.words))

    group_results = []
    for g in parsed:
        cur = docs
        for item in g:
            how = "left_anti" if item.negated else "left_semi"
            cur = cur.join(item_ids(item), "doc_id", how)
        group_results.append(cur)
    if not group_results:
        return docs
    out = group_results[0]
    for other in group_results[1:]:
        out = out.unionByName(other)
    return out.dropDuplicates(["doc_id"]) if len(group_results) > 1 else out


def _parse_filter_ts(value: str, name: str):
    """Driver-side timestamp validation: an unparseable bound must raise
    (the reference's parameter binding would), never cast to NULL and
    silently filter out every row."""
    from datetime import datetime

    try:
        return datetime.fromisoformat(value)
    except ValueError:
        raise ValueError(
            f"{name}={value!r} is not an ISO date/timestamp "
            "(YYYY-MM-DD[ HH:MM:SS])"
        ) from None


def _apply_common_filters(df: DataFrame, ocr_user, ocr_from, ocr_to) -> DataFrame:
    """Date-range + ILIKE predicates (Q2/Q3 — search.py:53-55)."""
    if "created_at" in df.columns:
        lo = _parse_filter_ts(ocr_from or DEFAULT_FROM, "ocr_from")
        hi = _parse_filter_ts(ocr_to or DEFAULT_TO, "ocr_to")
        df = df.filter(
            F.col("created_at").between(
                F.lit(lo).cast("timestamp"), F.lit(hi).cast("timestamp")
            )
        )
    if ocr_user and "email" in df.columns:
        df = df.filter(F.col("email").ilike(f"%{ocr_user}%"))
    return df


def _items_projection(df: DataFrame, snippet_col, rank_col, sim_col, httpfs: str):
    """Reference item contract (app/search.py:92-98): id/filename/link/
    snippet/snippet_is_html — ``doc_id`` is the id (our PK), ``link`` is the
    httpfs URL composed from path_origin with backslashes normalized, and
    ``snippet_is_html`` is constant True (the <b> marks). rank/sim ride
    along for the API consumers that sort client-side."""
    cols = df.columns
    filename = F.col("filename") if "filename" in cols else F.col("doc_id")
    if "path_origin" in cols:
        link = F.concat(
            F.lit(f"http://{httpfs}/"),
            F.replace(F.col("path_origin"), F.lit("\\"), F.lit("/")),
        )
    else:
        link = F.concat(F.lit(f"http://{httpfs}/"), filename)
    out = [
        F.col("doc_id"),
        filename.alias("filename"),
        link.alias("link"),
        snippet_col.alias("snippet"),
        F.lit(True).alias("snippet_is_html"),
    ]
    if rank_col is not None:
        out.append(F.round(rank_col, 6).alias("rank"))
    if sim_col is not None:
        out.append(F.round(sim_col, 6).alias("sim"))
    return df.select(*out)


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
    httpfs: str = DEFAULT_HTTPFS,
) -> dict:
    """Full search flow; returns ``{"total": int, "items": DataFrame}``.

    Mirrors ``search_documents`` (search.py:10-99): empty query → total
    count + latest 10; otherwise match under full websearch_to_tsquery
    grammar (quoted phrases, OR groups, -exclusion — search.py:51-52), rank
    by ``GREATEST(rank, sim)`` desc (search.py:81), project the reference
    item contract (doc_id/filename/link/snippet/snippet_is_html + rank,
    sim — search.py:92-98), paginate.

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
        items = _items_projection(
            docs.orderBy(*order, F.col("doc_id")).limit(10),
            F.substring("content", 1, 800),
            None,
            None,
            httpfs,
        )
        return {"total": total, "items": items}

    parsed = parse_websearch(q)
    terms = positive_terms(parsed)
    filtered = _apply_common_filters(docs, ocr_user, ocr_from, ocr_to)
    corpus_scope = filtered  # pre-FTS-match scope (bm25 IDF base)

    if q and not parsed:
        # token-free query ('???', bare 'or'): websearch_to_tsquery yields
        # an EMPTY tsquery, and `@@ empty` matches no rows — matching the
        # whole corpus here would invert the reference semantics
        filtered = filtered.filter(F.lit(False))
    elif parsed:
        if postings is not None and is_plain_and(parsed):
            # scale path (plain AND of terms): semi-join matching doc ids
            terms_set = {it.words[0] for it in parsed[0]}
            from ocr_search_spark.localrel import strings_df

            # JVM-local VALUES relation — no Python-RDD scan per query (r6)
            term_df = strings_df(
                postings.sparkSession, sorted(terms_set), "term"
            )
            matched = (
                postings.join(F.broadcast(term_df), "term", "inner")
                .groupBy("doc_id")
                .agg(F.count_distinct("term").alias("nt"))
                .filter(F.col("nt") == len(terms_set))
                .select("doc_id")
            )
            filtered = filtered.join(matched, "doc_id", "left_semi")
        elif postings is not None:
            # scale path, full grammar: positional phrase match + per-item
            # semi/anti-joins — never re-tokenizes the corpus
            filtered = websearch_match_postings(filtered, postings, parsed)
        else:
            # full websearch grammar: materialize toks + the adjacency
            # string in successive projections (plan-shape invariant), then
            # one Catalyst boolean filter
            filtered = (
                filtered.withColumn("__toks", tokens_expr("content"))
                .withColumn("__tokstr", token_string_expr("__toks"))
                .filter(websearch_predicate("__toks", "__tokstr", parsed))
                .drop("__toks", "__tokstr")
            )

    total = filtered.count()

    if rank_mode != "simple" and terms:
        from .ranking import bm25_scores, cover_density_rank

        if rank_mode == "cd":
            # per-OR-group proximity: cover_density_rank enforces AND over
            # its term list, so 'alpha or beta' must rank each group
            # separately (a doc matching only one branch is a legitimate
            # match) and take the best branch — ts_rank_cd semantics
            group_ranks = []
            for gi, group in enumerate(parsed):
                gterms = list(
                    dict.fromkeys(
                        w for it in group if not it.negated for w in it.words
                    )
                )
                if not gterms:
                    continue
                group_ranks.append(
                    cover_density_rank(
                        filtered, gterms, id_col="doc_id", text_col="content"
                    ).select("doc_id", F.col("rank_cd").alias(f"__r{gi}"))
                )
            ranks = group_ranks[0]
            for r in group_ranks[1:]:
                ranks = ranks.join(r, "doc_id", "full")
            rcols = [
                F.coalesce(F.col(c), F.lit(0.0))
                for c in ranks.columns
                if c != "doc_id"
            ]
            best = rcols[0] if len(rcols) == 1 else F.greatest(*rcols)
            ranks = ranks.select("doc_id", best.alias("__rank"))
        elif rank_mode == "bm25":
            ranks = bm25_scores(
                filtered, terms, id_col="doc_id", text_col="content",
                stats_over=corpus_scope,
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
    if terms:
        # highlight the first query term the document actually contains
        # (an OR match via a later branch must not get an empty snippet);
        # bounded chain — at most 4 locate/substr probes per row
        snip = F.coalesce(
            *[
                F.nullif(snippet_expr("content", t), F.lit(""))
                for t in terms[:4]
            ],
            F.lit(""),
        )
    else:
        # filter-only search: a leading fragment, no highlight — an empty
        # highlight term would <b></b>-garble every character boundary
        snip = F.substring("content", 1, 800)
    scored = _items_projection(
        base,
        snip,
        rank_col,
        trigram_sim_udf(q)(F.col("content")),
        httpfs,
    ).withColumn("score", F.greatest("rank", "sim"))

    # Pagination via native LIMIT/OFFSET: Catalyst plans orderBy + offset +
    # limit as a single TakeOrderedAndProject(offset+limit) — top-(o+k)
    # partial per partition, never a global single-partition sort (the
    # round-1 Window.orderBy formulation moved every matched row through
    # one task; asserted gone in tests/test_plans.py).
    ordered = scored.orderBy(F.col("score").desc(), F.col("doc_id"))
    if offset:
        ordered = ordered.offset(offset)
    items = ordered.limit(limit).drop("score")
    return {"total": total, "items": items}
