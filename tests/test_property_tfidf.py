"""Property-based invariant for the tf-idf related-docs ranking
(search/ranking.py tfidf_related_topk): for arbitrary small corpora the
(a, b, dot, rnk) table must EXACTLY equal a scalar model on the same
half-bit lattice — weights, df pruning, integer dots, (dot DESC, b ASC)
ranking. No tolerance: the ranking path is pure BIGINT by design.

Alphabet stays inside the shared ``tokens_expr`` token class so
tokenization is byte-identical between the scalar model and the engine.
"""

from __future__ import annotations

import math
import re
from collections import Counter

from hypothesis import given, settings
from hypothesis import strategies as st

_WORD = st.text(alphabet="abcд0_", min_size=1, max_size=4)
_DOC = st.lists(_WORD, min_size=0, max_size=10).map(" ".join)
_CORPUS = st.lists(_DOC, min_size=2, max_size=8)


def _hb(x: int) -> int:
    return math.floor(2 * math.log2(x))


def _scalar(docs, k, frac):
    toks = {i: re.findall(r"[a-zа-яё0-9_]+", t.lower()) for i, t in enumerate(docs)}
    n = len(docs)
    tf = {i: Counter(ws) for i, ws in toks.items()}
    df = Counter(t for c in tf.values() for t in c)
    cut = math.floor(frac * n)
    w = {
        i: {
            t: (1 + _hb(c)) * (_hb(n) - _hb(df[t]))
            for t, c in cnt.items()
            if df[t] <= cut and (1 + _hb(c)) * (_hb(n) - _hb(df[t])) > 0
        }
        for i, cnt in tf.items()
    }
    out = []
    for a in w:
        cand = []
        for b in w:
            if a == b:
                continue
            dot = sum(w[a][t] * w[b][t] for t in w[a].keys() & w[b].keys())
            if dot > 0:
                cand.append((b, dot))
        cand.sort(key=lambda x: (-x[1], x[0]))
        for rnk, (b, dot) in enumerate(cand[:k], 1):
            out.append((a, b, dot, rnk))
    return sorted(out)


@settings(max_examples=6, deadline=None)
@given(docs=_CORPUS, k=st.integers(min_value=1, max_value=3),
       frac=st.sampled_from([0.5, 0.75, 1.0]))
def test_tfidf_related_matches_scalar_model(spark, docs, k, frac):
    from ocr_search_spark.search.ranking import tfidf_related_topk

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id long, text string"
    )
    got = sorted(
        (r.a, r.b, r.dot, r.rnk)
        for r in tfidf_related_topk(df, k=k, max_df_frac=frac).collect()
    )
    assert got == _scalar(docs, k, frac)
