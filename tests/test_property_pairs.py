"""Property-based invariants for the inverted-posting pair operators.

Random corpora drawn from a TINY token alphabet (so shingle collisions,
exact dups, subsets and near-dups all occur constantly) are scored by a
scalar set-arithmetic model; `jaccard_pairs_index` and
`containment_pairs` must reproduce it exactly, for any threshold. Few
hypothesis examples (each example runs Spark jobs) but every example is
a whole corpus.
"""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st

_WORD = st.sampled_from(["alpha", "beta", "gamma", "delta", "omega", "x1"])
_DOC = st.lists(_WORD, min_size=0, max_size=12).map(" ".join)
_CORPUS = st.lists(_DOC, min_size=2, max_size=9)
_TOKEN_RE = re.compile(r"[^a-zа-яё0-9_]+")


def _shingles(text: str, k: int = 3) -> set[str]:
    toks = [t for t in _TOKEN_RE.split(text.lower()) if t]
    if len(toks) < k:
        return set()
    return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}


def _model(corpus: list[str]):
    sets = {str(i): _shingles(t) for i, t in enumerate(corpus)}
    ids = sorted(sets)
    pairs = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(sets[a] & sets[b])
            if inter:
                pairs[(a, b)] = (inter, len(sets[a]), len(sets[b]))
    return pairs


class TestPairOpsMatchScalarModel:
    @settings(max_examples=8, deadline=None)
    @given(corpus=_CORPUS, thr=st.sampled_from([0.2, 0.5, 0.9, 1.0]))
    def test_jaccard_index(self, spark, corpus, thr):
        from ocr_search_spark.ops.dedup import jaccard_pairs_index

        df = spark.createDataFrame(
            [(str(i), t) for i, t in enumerate(corpus)],
            "doc_id string, text string",
        )
        got = {
            (r.a_id, r.b_id): (r.inter, r["union"])
            for r in jaccard_pairs_index(df, "doc_id", "text", thr).collect()
        }
        want = {}
        for (a, b), (inter, na, nb) in _model(corpus).items():
            union = na + nb - inter
            if inter >= union * thr:
                want[(a, b)] = (inter, union)
        assert got == want

    @settings(max_examples=8, deadline=None)
    @given(corpus=_CORPUS, thr_bp=st.sampled_from([2500, 7000, 10000]))
    def test_containment(self, spark, corpus, thr_bp):
        from ocr_search_spark.ops.dedup import containment_pairs

        df = spark.createDataFrame(
            [(str(i), t) for i, t in enumerate(corpus)],
            "doc_id string, text string",
        )
        got = {
            (r.a_id, r.b_id): (r.inter, r.n_a, r.n_b, r.containment_bp)
            for r in containment_pairs(
                df, "doc_id", "text", thr_bp
            ).collect()
        }
        want = {}
        for (a, b), (inter, na, nb) in _model(corpus).items():
            if inter * 10000 >= thr_bp * min(na, nb):
                want[(a, b)] = (inter, na, nb, (inter * 10000) // min(na, nb))
        assert got == want

    @settings(max_examples=4, deadline=None)
    @given(corpus=_CORPUS)
    def test_exact_dup_always_pairs_at_threshold_one(self, spark, corpus):
        """Any two identical docs with >=1 shingle must pair at Jaccard
        threshold 1.0 — the floor every dedup guarantee stands on."""
        from ocr_search_spark.ops.dedup import jaccard_pairs_index

        twin = corpus + [corpus[0]]
        df = spark.createDataFrame(
            [(str(i), t) for i, t in enumerate(twin)],
            "doc_id string, text string",
        )
        got = {
            (r.a_id, r.b_id)
            for r in jaccard_pairs_index(df, "doc_id", "text", 1.0).collect()
        }
        if _shingles(corpus[0]):
            assert ("0", str(len(twin) - 1)) in got
