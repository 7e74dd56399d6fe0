"""Corpus-level duplicate-line removal (the C4 / ccnet boilerplate pass).

Web text is full of lines that repeat across documents — cookie banners,
"all rights reserved", navigation crumbs. The C4 pipeline removes every
line that occurs in ≥ N distinct documents *corpus-wide* (not per-doc,
which ``ops.text_analysis.repetition_signals`` already covers). The
reference engine has no analogue; this is a first-class training-data
operator in the dedup family.

Scale shape: explode lines → md5 line key → ``countDistinct(doc)`` per
key (map-side combinable) → anti-join survivors back → order-preserving
re-assembly via ``array_sort(collect_list(struct(pos, line)))``. Two
shuffles total (line-key agg, doc-id regroup); the duplicate-line table
is joined on the line hash, never collected — at 100 TB the dup set is
itself huge (every boilerplate line on the web) and must stay
distributed. No UDFs anywhere; the re-assembly stays in codegen via
``array_join(transform(...))``.

Delimiter: a *literal* string (escaped into the regex Spark's ``split``
expects), so the DuckDB oracle's ``string_split`` — which is literal-only
— computes the identical segmentation, trailing empties included.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def explode_lines(
    df: DataFrame, id_col: str, text_col: str, delim: str = "\n"
) -> DataFrame:
    """One row per line: (id, pos, line, line_md5). ``pos`` is 1-based so
    the oracle's ``generate_subscripts`` twin matches. Keeps empty lines
    (they participate in re-assembly; they never count as duplicates —
    see ``duplicate_lines``)."""
    # null text behaves as empty text (one empty line) — a doc must never
    # vanish from the corpus because its text column is null
    arr = F.split(F.coalesce(F.col(text_col), F.lit("")), re.escape(delim), -1)
    return df.select(
        F.col(id_col).alias("id"), F.posexplode(arr).alias("pos0", "line")
    ).select(
        "id",
        (F.col("pos0") + 1).alias("pos"),
        "line",
        F.md5(F.encode(F.col("line"), "utf-8")).alias("line_md5"),
    )


def duplicate_lines(
    exploded: DataFrame, min_docs: int = 2, min_chars: int = 1
) -> DataFrame:
    """Line keys occurring in ≥ ``min_docs`` distinct docs:
    (line_md5, n_docs, n_occurrences). Lines shorter than ``min_chars``
    (default: empty lines) never qualify — C4 ignores trivial lines."""
    return (
        exploded.filter(F.length("line") >= min_chars)
        .groupBy("line_md5")
        .agg(
            F.countDistinct("id").alias("n_docs"),
            F.count("*").alias("n_occurrences"),
        )
        .filter(F.col("n_docs") >= min_docs)
    )


def remove_duplicate_lines(
    df: DataFrame,
    id_col: str,
    text_col: str,
    delim: str = "\n",
    min_docs: int = 2,
    min_chars: int = 1,
) -> DataFrame:
    """C4 duplicate-line removal: drop every line occurring in
    ≥ ``min_docs`` distinct documents, re-assemble the remaining lines in
    their original order. Returns (id, text_clean, n_lines, n_removed);
    documents whose every line was boilerplate survive with
    ``text_clean = ''``.
    """
    ex = explode_lines(df, id_col, text_col, delim)
    dups = duplicate_lines(ex, min_docs=min_docs, min_chars=min_chars)
    kept = ex.join(dups, "line_md5", "left_anti")
    rebuilt = kept.groupBy("id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"],
            ),
            delim,
        ).alias("text_clean"),
        F.count("*").alias("n_kept"),
    )
    totals = ex.groupBy("id").agg(F.count("*").alias("n_lines"))
    return (
        totals.join(rebuilt, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("text_clean", F.lit("")).alias("text_clean"),
            "n_lines",
            (F.col("n_lines") - F.coalesce("n_kept", F.lit(0))).alias(
                "n_removed"
            ),
        )
    )


def remove_duplicate_paragraphs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_docs: int = 2,
    min_chars: int = 10,
) -> DataFrame:
    """Paragraph-level corpus dedup (the Dolma-style variant of the C4
    line pass): identical machinery, but the unit is a PARAGRAPH — a
    literal ``\\n\\n``-delimited block — and the triviality floor is
    higher (``min_chars=10``: a repeated heading is not boilerplate
    evidence the way a repeated 200-char footer is). Same two-shuffle
    plan, same distributed dup table, same order-preserving
    re-assembly; returns (id, text_clean, n_lines, n_removed) where the
    counted units are paragraphs."""
    return remove_duplicate_lines(
        df, id_col, text_col, delim="\n\n", min_docs=min_docs,
        min_chars=min_chars,
    )


def remove_repeated_lines_within_doc(
    df: DataFrame,
    id_col: str,
    text_col: str,
    delim: str = "\n",
    min_chars: int = 1,
) -> DataFrame:
    """WITHIN-document repeated-line removal (the intra-doc half of the
    boilerplate pass — Dolma's paragraph dedup runs this shape before
    any corpus-level work): keep the FIRST occurrence of each line in a
    document, drop later repeats. Lines shorter than ``min_chars``
    never count as repeats (empty spacer lines survive verbatim, the
    same triviality floor as :func:`duplicate_lines`).

    Scale shape: there is no shuffle AT ALL — the whole operator is one
    projection per row (split → keep-first filter via
    ``array_position(arr, x) == index`` → re-join), so it composes into
    any pipeline as a free narrow stage. Per-row cost is O(lines²)
    string compares, bounded by document size like every other per-doc
    kernel. Returns (id, text_clean, n_lines, n_removed).
    """
    arr = F.split(F.coalesce(F.col(text_col), F.lit("")), re.escape(delim), -1)
    base = df.select(F.col(id_col).alias("id"), arr.alias("__lines"))
    kept = F.filter(
        F.col("__lines"),
        lambda x, i: (F.length(x) < min_chars)
        | (F.array_position(F.col("__lines"), x) == i + 1),
    )
    return base.select(
        F.col("id").alias(id_col),
        F.array_join(kept, delim).alias("text_clean"),
        F.size("__lines").alias("n_lines"),
        (F.size("__lines") - F.size(kept)).alias("n_removed"),
    )
