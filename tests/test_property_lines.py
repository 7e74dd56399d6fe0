"""Property-based invariants for corpus-wide duplicate-line removal.

A scalar Python model computes the expected result for arbitrary
corpora (duplicate lines within one doc, empty lines, empty docs,
unicode); the Spark operator must match it exactly. Few hypothesis
examples (Spark jobs are not free) but each example is a whole corpus.
"""

from __future__ import annotations

from collections import Counter

from hypothesis import given, settings
from hypothesis import strategies as st

_LINE = st.text(
    alphabet=st.characters(
        codec="utf-8", exclude_characters="\n", categories=("L", "N", "P", "Zs")
    ),
    max_size=12,
)
_DOC = st.lists(_LINE, min_size=0, max_size=6).map(lambda ls: "\n".join(ls))
_CORPUS = st.lists(_DOC, min_size=1, max_size=8)


def _model(corpus: list[str], min_docs: int = 2, min_chars: int = 1):
    """Scalar model of remove_duplicate_lines."""
    docs_per_line: Counter[str] = Counter()
    for text in corpus:
        for line in set(text.split("\n")):
            if len(line) >= min_chars:
                docs_per_line[line] += 1
    dup = {l for l, n in docs_per_line.items() if n >= min_docs}
    out = {}
    for i, text in enumerate(corpus):
        lines = text.split("\n")
        kept = [l for l in lines if l not in dup]
        out[str(i)] = ("\n".join(kept), len(lines), len(lines) - len(kept))
    return out


class TestLineDedupProperties:
    @settings(max_examples=12, deadline=None)
    @given(corpus=_CORPUS)
    def test_matches_scalar_model(self, spark, corpus):
        from ocr_search_spark.ops.lines import remove_duplicate_lines

        df = spark.createDataFrame(
            [(str(i), t) for i, t in enumerate(corpus)],
            "doc_id string, text string",
        )
        got = {
            r.doc_id: (r.text_clean, r.n_lines, r.n_removed)
            for r in remove_duplicate_lines(df, "doc_id", "text").collect()
        }
        assert got == _model(corpus)

    @settings(max_examples=6, deadline=None)
    @given(corpus=_CORPUS)
    def test_unique_corpus_is_identity(self, spark, corpus):
        """If no non-trivial line appears in two docs, every doc survives
        unchanged — dedup must never touch unique content."""
        seen: set[str] = set()
        uniq = []
        for i, t in enumerate(corpus):
            # prefix every line with the doc index to force uniqueness
            lines = [f"{i}:{l}" if l else l for l in t.split("\n")]
            if any(l in seen for l in lines if l):
                continue
            seen.update(l for l in lines if l)
            uniq.append("\n".join(lines))
        if not uniq:
            return
        from ocr_search_spark.ops.lines import remove_duplicate_lines

        df = spark.createDataFrame(
            [(str(i), t) for i, t in enumerate(uniq)],
            "doc_id string, text string",
        )
        got = {
            r.doc_id: (r.text_clean, r.n_removed)
            for r in remove_duplicate_lines(df, "doc_id", "text").collect()
        }
        assert got == {str(i): (t, 0) for i, t in enumerate(uniq)}
