"""Property-based invariants for the deterministic cardinality sketches
(ops/sketch.py) and the NB classifier trainer (ops/classify.py).

A scalar Python model (same md5 threshold decisions, same integer
arithmetic) computes the expected outputs for arbitrary value
multisets; the Spark operators must match EXACTLY — the whole point of
deterministic sketches is that there is no tolerance band. Few
hypothesis examples (Spark jobs are not free) but each example is a
whole input table.
"""

from __future__ import annotations

import functools
import hashlib

from hypothesis import given, settings
from hypothesis import strategies as st

_VAL = st.text(
    alphabet=st.characters(codec="utf-8", categories=("Ll", "Nd")),
    min_size=1,
    max_size=6,
)
# multisets with duplicates: sampling decisions are per-VALUE
_VALS = st.lists(_VAL, min_size=1, max_size=60)
_BITS = st.integers(min_value=0, max_value=8)


def _h32(v: str) -> int:
    return int(hashlib.md5(v.encode()).hexdigest()[:8], 16)


@settings(max_examples=10, deadline=None)
@given(vals=_VALS, bits=_BITS)
def test_distinct_estimate_matches_scalar_model(spark, vals, bits):
    from ocr_search_spark.ops.sketch import distinct_estimate

    df = spark.createDataFrame([("g", v) for v in vals], "grp string, v string")
    rows = distinct_estimate(df, ["grp"], "v", bits).collect()

    cutoff = (1 << 32) >> bits
    want = len({v for v in vals if _h32(v) < cutoff})
    if want == 0:
        assert rows == []  # nothing sampled -> group absent, not zero
    else:
        [r] = rows
        assert (r.n_sampled, r.n_est) == (want, want << bits)


@settings(max_examples=8, deadline=None)
@given(a=_VALS, b=_VALS, bits=st.integers(min_value=0, max_value=4))
def test_sampled_jaccard_matches_scalar_model(spark, a, b, bits):
    from ocr_search_spark.ops.sketch import sampled_jaccard

    df = spark.createDataFrame(
        [("a", v) for v in a] + [("b", v) for v in b], "grp string, v string"
    )
    rows = sampled_jaccard(df, "grp", "v", bits).collect()

    cutoff = (1 << 32) >> bits
    sa = {v for v in a if _h32(v) < cutoff}
    sb = {v for v in b if _h32(v) < cutoff}
    inter, union = len(sa & sb), len(sa | sb)
    if inter == 0:
        assert rows == []
    else:
        [r] = rows
        assert (r.set_a, r.set_b) == ("a", "b")
        assert (r.n_inter, r.n_union) == (inter, union)
        assert r.jaccard_pm == (1000 * inter) // union


_LABELED = st.lists(
    st.tuples(st.booleans(), st.lists(_VAL, min_size=0, max_size=8)),
    min_size=1,
    max_size=12,
)


@settings(max_examples=8, deadline=None)
@given(docs=_LABELED)
def test_nb_train_matches_scalar_model(spark, docs):
    from ocr_search_spark.ops.classify import NB_HB_FP, nb_train

    n_buckets = 1 << 18
    df = spark.createDataFrame(
        [
            (i, "pos" if is_pos else "neg", " ".join(toks))
            for i, (is_pos, toks) in enumerate(docs)
        ],
        "doc_id long, label string, text string",
    )
    got = {
        r.bucket: r.weight_fp
        for r in nb_train(
            df, "label", "pos", n_buckets=n_buckets, bigrams=False
        ).collect()
    }

    # NOTE: nb_train tokenizes via tokens_expr (lowercase, [^a-zа-яё0-9_]
    # split); the strategy already emits lowercase letters/digits, but
    # characters outside the token class split words — replicate exactly
    import re

    def toks(text):
        return [t for t in re.split(r"[^a-zа-яё0-9_]+", text.lower()) if t]

    def bucket(tok):
        return _h32(tok) % n_buckets

    def hb(x):
        return (x * x).bit_length() - 1

    cp, cn = {}, {}
    for is_pos, words in docs:
        for tok in toks(" ".join(words)):
            d = cp if is_pos else cn
            d[bucket(tok)] = d.get(bucket(tok), 0) + 1
    tp, tn = sum(cp.values()), sum(cn.values())
    want = {
        bk: NB_HB_FP
        * (
            (hb(cp.get(bk, 0) + 1) - hb(tp + n_buckets))
            - (hb(cn.get(bk, 0) + 1) - hb(tn + n_buckets))
        )
        for bk in set(cp) | set(cn)
    }
    assert got == want


def test_manifest_xor_is_fold_of_digests(spark):
    """Non-hypothesis spot anchor: content_xor equals the fold of
    per-doc digests regardless of input ordering (reversed input)."""
    from ocr_search_spark.ops.sampling import shard_manifest

    rows = [("s", i, f"doc {i}") for i in range(25)]
    want = functools.reduce(
        lambda acc, r: acc
        ^ int(hashlib.md5(f"{r[1]}:{r[2]}".encode()).hexdigest()[:15], 16),
        rows,
        0,
    )
    for data in (rows, rows[::-1]):
        df = spark.createDataFrame(data, "shard string, doc_id long, text string")
        [r] = shard_manifest(df, ["shard"], "doc_id", "text").collect()
        assert r.content_xor == want
