"""Property-based invariants for DSIR importance weighting.

A scalar Python model (md5 buckets, half-bit integer log weights)
scores arbitrary target/raw corpora; the Spark operator must match it
exactly — including empty-ish documents, unicode tokens, and targets
that share no vocabulary with the pool. Few hypothesis examples (Spark
jobs are not free) but each example is a whole corpus pair.
"""

from __future__ import annotations

import hashlib
import math
import re

from hypothesis import given, settings
from hypothesis import strategies as st

_WORD = st.text(
    alphabet=st.characters(codec="utf-8", categories=("Ll", "Nd")),
    min_size=1,
    max_size=6,
)
_DOC = st.lists(_WORD, min_size=0, max_size=10).map(" ".join)
_RAW = st.lists(_DOC, min_size=1, max_size=10)
_TARGET = st.lists(_DOC, min_size=1, max_size=4)

_B = 1024


def _grams(text: str) -> list[str]:
    toks = [t for t in re.split(r"[^a-zа-яё0-9_]+", text.lower()) if t]
    return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]


def _bucket(g: str) -> int:
    return int(hashlib.md5(f"dsir:{g}".encode()).hexdigest()[:8], 16) % _B


def _hb(x: int) -> int:
    return math.floor(2 * math.log2(x))


def _model(raw: list[str], target: list[str]) -> dict[int, tuple[int, int]]:
    ct: dict[int, int] = {}
    cr: dict[int, int] = {}
    for t in target:
        for g in _grams(t):
            ct[_bucket(g)] = ct.get(_bucket(g), 0) + 1
    for t in raw:
        for g in _grams(t):
            cr[_bucket(g)] = cr.get(_bucket(g), 0) + 1
    tt, tr = sum(ct.values()), sum(cr.values())
    delta = _hb(tr + _B) - _hb(tt + _B)
    out = {}
    for i, t in enumerate(raw):
        gs = _grams(t)
        w = sum(
            _hb(ct.get(_bucket(g), 0) + 1) - _hb(cr.get(_bucket(g), 0) + 1)
            for g in gs
        ) + len(gs) * delta
        out[i] = (len(gs), w)
    return out


@settings(max_examples=10, deadline=None)
@given(raw=_RAW, target=_TARGET)
def test_dsir_weights_match_scalar_model(spark, raw, target):
    from ocr_search_spark.ops.dsir import dsir_weights

    raw_df = spark.createDataFrame(
        list(enumerate(raw)), "doc_id long, text string"
    )
    tgt_df = spark.createDataFrame(
        [(100 + i, t) for i, t in enumerate(target)], "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.n_grams, r.w_hb)
        for r in dsir_weights(raw_df, tgt_df).collect()
    }
    assert got == _model(raw, target)
