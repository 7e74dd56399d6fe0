"""Tests for the CCNet-style n-gram LM quality scoring (ops/lm.py).

Semantics checked against a scalar Python twin (exact integer
arithmetic), plus the ccnet bucketing invariants and the
floor-log2-via-bin identity itself.
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from ocr_search_spark.ops.lm import (
    ccnet_buckets,
    lm_score,
    lm_vocab_size,
    ngram_lm,
)

TOKEN_RE = re.compile(r"[^a-zа-яё0-9_]+")


def _toks(text: str) -> list[str]:
    return [t for t in TOKEN_RE.split(text.lower()) if t]


def _scalar_lm(ref_texts: list[str]):
    """Scalar twin of ngram_lm + lm_vocab_size."""
    c_gram: dict[tuple[str, str], int] = {}
    c_prefix: dict[str, int] = {}
    vocab: set[str] = set()
    for text in ref_texts:
        toks = _toks(text)
        vocab.update(toks)
        for w1, w2 in zip(toks, toks[1:]):
            c_gram[(w1, w2)] = c_gram.get((w1, w2), 0) + 1
            c_prefix[w1] = c_prefix.get(w1, 0) + 1
    return c_gram, c_prefix, len(vocab)


def _scalar_score(text: str, c_gram, c_prefix, v):
    """Scalar twin of lm_score for one document."""
    toks = _toks(text)
    bits_total = 0
    n_grams = 0
    for w1, w2 in zip(toks, toks[1:]):
        n_grams += 1
        r = (c_prefix.get(w1, 0) + v) // (c_gram.get((w1, w2), 0) + 1)
        bits_total += r.bit_length() - 1
    bpk = None if n_grams == 0 else (bits_total * 1000) // n_grams
    return n_grams, bits_total, bpk


REF = [
    "the quick brown fox jumps over the lazy dog",
] * 20 + [
    "the quick red fox sleeps",
    "a lazy dog naps under the tree",
]
DOCS = [
    ("in", "the quick brown fox jumps over the lazy dog"),  # in-domain
    ("part", "the quick green elephant jumps"),  # partly seen
    ("ood", "совершенно другой текст на русском языке"),  # out of domain
    ("one", "single"),  # no bigrams
    ("empty", ""),  # no tokens at all
]


@pytest.fixture(scope="module")
def lm_parts(spark):
    ref = spark.createDataFrame([(t,) for t in REF], "text string")
    docs = spark.createDataFrame(DOCS, "doc_id string, text string")
    return docs, ngram_lm(ref), lm_vocab_size(ref)


class TestLmScore:
    def test_matches_scalar_twin(self, lm_parts):
        docs, lm, vocab = lm_parts
        got = {
            r["doc_id"]: (r["n_grams"], r["bits_total"], r["bits_per_kilotoken"])
            for r in lm_score(docs, lm, vocab).collect()
        }
        c_gram, c_prefix, v = _scalar_lm(REF)
        for doc_id, text in DOCS:
            assert got[doc_id] == _scalar_score(text, c_gram, c_prefix, v), doc_id

    def test_ordering_in_domain_beats_ood(self, lm_parts):
        docs, lm, vocab = lm_parts
        got = {
            r["doc_id"]: r["bits_per_kilotoken"]
            for r in lm_score(docs, lm, vocab).collect()
        }
        # a sentence the LM was trained on must score far fewer
        # bits/token than text paying the unseen-gram penalties (with a
        # tiny vocab the partly-seen and fully-OOD penalties coincide —
        # the load-bearing ccnet property is in-domain << everything else)
        assert got["in"] * 4 < got["part"]
        assert got["in"] * 4 < got["ood"]
        assert got["one"] is None and got["empty"] is None

    def test_unscorable_docs_survive_with_zero(self, lm_parts):
        docs, lm, vocab = lm_parts
        rows = {r["doc_id"]: r for r in lm_score(docs, lm, vocab).collect()}
        assert rows["empty"]["n_grams"] == 0
        assert rows["empty"]["bits_total"] == 0
        assert len(rows) == len(DOCS)  # scoring never drops documents

    def test_lm_sufficient_stats(self, spark, lm_parts):
        _, lm, vocab = lm_parts
        c_gram, c_prefix, v = _scalar_lm(REF)
        got = {
            (r["w1"], r["w2"]): (r["c_gram"], r["c_prefix"])
            for r in lm.collect()
        }
        assert len(got) == len(c_gram)
        for (w1, w2), cg in c_gram.items():
            assert got[(w1, w2)] == (cg, c_prefix[w1])
        assert vocab.collect()[0]["v"] == v


class TestCcnetBuckets:
    def test_tercile_invariants(self, spark):
        # 9 scoreable docs in one lang -> exactly 3 per bucket, ordered
        rows = [(i, f"w{i} w{i} w{i} filler", "xx") for i in range(9)]
        docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
        ref = docs.filter("doc_id < 3")
        scored = lm_score(docs, ngram_lm(ref), lm_vocab_size(ref))
        out = ccnet_buckets(scored, docs.select("doc_id", "lang")).collect()
        by_bucket: dict[str, list] = {}
        for r in out:
            by_bucket.setdefault(r["bucket"], []).append(r["bits_per_kilotoken"])
        assert {k: len(v) for k, v in by_bucket.items()} == {
            "head": 3, "middle": 3, "tail": 3
        }
        assert max(by_bucket["head"]) <= min(by_bucket["middle"])
        assert max(by_bucket["middle"]) <= min(by_bucket["tail"])

    def test_unscorable_excluded(self, spark):
        rows = [(0, "a b c d", "xx"), (1, "solo", "xx"), (2, "", "xx")]
        docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
        scored = lm_score(docs, ngram_lm(docs), lm_vocab_size(docs))
        out = ccnet_buckets(scored, docs.select("doc_id", "lang")).collect()
        assert [r["doc_id"] for r in out] == [0]


class TestFloorLog2Identity:
    def test_bin_length_is_floor_log2(self, spark):
        # the identity the whole integer-exact design rests on
        df = spark.range(1, 5000).select(
            "id", (F.length(F.bin("id")) - 1).alias("bits")
        )
        for r in df.collect():
            assert r["bits"] == r["id"].bit_length() - 1


def _scalar_kn(ref_texts: list[str]):
    """Scalar twin of kn_lm sufficient statistics."""
    c_gram: dict[tuple[str, str], int] = {}
    vocab: set[str] = set()
    for text in ref_texts:
        toks = _toks(text)
        vocab.update(toks)
        for w1, w2 in zip(toks, toks[1:]):
            c_gram[(w1, w2)] = c_gram.get((w1, w2), 0) + 1
    c_prefix: dict[str, int] = {}
    n1p: dict[str, int] = {}
    n1c: dict[str, int] = {}
    for (w1, w2), c in c_gram.items():
        c_prefix[w1] = c_prefix.get(w1, 0) + c
        n1p[w1] = n1p.get(w1, 0) + 1
        n1c[w2] = n1c.get(w2, 0) + 1
    return c_gram, c_prefix, n1p, n1c, len(c_gram), len(vocab)


def _scalar_kn_score(text: str, model):
    """Scalar twin of kn_score for one document."""
    c_gram, c_prefix, n1p, n1c, b, v = model
    bv = b + v
    toks = _toks(text)
    bits_total = 0
    n_grams = 0
    for w1, w2 in zip(toks, toks[1:]):
        n_grams += 1
        cp = c_prefix.get(w1)
        if cp is None:
            num = n1c.get(w2, 0) + 1
            den = bv
        else:
            c = c_gram.get((w1, w2))
            disc = 0 if c is None else 4 * c - 3
            num = disc * bv + 3 * n1p[w1] * (n1c.get(w2, 0) + 1)
            den = 4 * cp * bv
        bits_total += (den // num).bit_length() - 1
    bpk = None if n_grams == 0 else (bits_total * 1000) // n_grams
    return n_grams, bits_total, bpk


class TestKneserNey:
    DOCS = REF + [
        "completely unseen context words here",
        "the quick brown fox jumps over the lazy dog",
        "fox the dog quick",
        "",
        "one",
    ]

    def _spark_scores(self, spark, ref_texts, doc_texts):
        from ocr_search_spark.ops.lm import kn_lm, kn_score

        ref = spark.createDataFrame([(t,) for t in ref_texts], "text string")
        docs = spark.createDataFrame(
            [(i, t) for i, t in enumerate(doc_texts)],
            "doc_id long, text string",
        )
        out = kn_score(docs, kn_lm(ref))
        return {
            r.doc_id: (r.n_grams, r.bits_total, r.bits_per_kilotoken)
            for r in out.collect()
        }

    def test_matches_scalar_model(self, spark):
        got = self._spark_scores(spark, REF, self.DOCS)
        model = _scalar_kn(REF)
        for i, text in enumerate(self.DOCS):
            assert got[i] == _scalar_kn_score(text, model), (i, text)

    def test_probability_is_proper(self):
        """Scalar sanity: P sums to <= 1 per seen context, each P <= 1."""
        model = _scalar_kn(REF)
        c_gram, c_prefix, n1p, n1c, b, v = model
        from fractions import Fraction

        for w1, cp in c_prefix.items():
            total = Fraction(0)
            words = {w2 for (a, w2) in c_gram if a == w1} | set(n1c)
            for w2 in words:
                c = c_gram.get((w1, w2), 0)
                p = Fraction(max(4 * c - 3, 0), 4 * cp) + Fraction(
                    3 * n1p[w1] * (n1c.get(w2, 0) + 1), 4 * cp * (b + v)
                )
                assert p <= 1
                total += p
            assert total <= 1

    def test_seen_text_scores_fewer_bits_than_gibberish(self, spark):
        got = self._spark_scores(
            spark,
            REF,
            ["the quick brown fox jumps", "zzq qqz xyzzy plugh"],
        )
        assert got[0][2] < got[1][2]

    def test_overflow_guard_raises(self, spark):
        from ocr_search_spark.ops.lm import kn_lm, kn_score

        ref = spark.createDataFrame([("a b",)], "text string")
        model = kn_lm(ref)
        # poison the scalars so 4*max_cp*(B+V) would overflow
        model["scalars"] = model["scalars"].select(
            (F.col("b") + F.lit(2**61)).alias("b"), "v"
        )
        docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
        with pytest.raises(Exception, match="exceed 2\\^63|shard the reference"):
            kn_score(docs, model).collect()
