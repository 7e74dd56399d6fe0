"""Property-based invariant for the BPE trainer (ops/text_analysis.py
bpe_train): for arbitrary small corpora, the learned merge table must
EXACTLY equal a scalar reference trainer (word-frequency weighted pair
counts, left-to-right non-overlapping application, ties (l, r)
ascending). No tolerance — the merge table is the deterministic
artifact a tokenizer ships.

Few hypothesis examples (each example runs n_merges Spark rounds), but
each is a whole corpus; the alphabet stays inside the shared
``tokens_expr`` token class so tokenization is byte-identical between
the scalar model and the engine.
"""

from __future__ import annotations

import re
from collections import Counter

from hypothesis import given, settings
from hypothesis import strategies as st

_WORD = st.text(alphabet="abcдеж0_", min_size=1, max_size=5)
_DOC = st.lists(_WORD, min_size=0, max_size=8).map(" ".join)
_CORPUS = st.lists(_DOC, min_size=1, max_size=6)


def _scalar_bpe(words: Counter, k: int, with_segs: bool = False):
    segs = {w: list(w) for w in words}
    merges = []
    for step in range(1, k + 1):
        pc = Counter()
        for w, c in words.items():
            s = segs[w]
            for x, y in zip(s, s[1:]):
                pc[(x, y)] += c
        if not pc:
            break
        (l, r), cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((step, l, r, l + r, cnt))
        for w, s in segs.items():
            out = []
            for sym in s:
                if out and out[-1] == l and sym == r:
                    out[-1] = l + r
                else:
                    out.append(sym)
            segs[w] = out
    if with_segs:
        return merges, segs
    return merges


@settings(max_examples=6, deadline=None)
@given(docs=_CORPUS, k=st.integers(min_value=1, max_value=4))
def test_bpe_train_matches_scalar_trainer(spark, docs, k):
    from ocr_search_spark.ops.text_analysis import bpe_train

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id long, text string"
    )
    got = [
        (r.step, r.l, r.r, r.merged, r.pair_count)
        for r in bpe_train(df, n_merges=k).collect()
    ]
    words = Counter(
        w for t in docs for w in re.findall(r"[a-zа-яё0-9_]+", t.lower())
    )
    assert got == _scalar_bpe(words, k)


@settings(max_examples=5, deadline=None)
@given(docs=_CORPUS, k=st.integers(min_value=1, max_value=4))
def test_bpe_encode_matches_scalar_encoder(spark, docs, k):
    """The encoded symbol stream (ops/text_analysis.py bpe_encode) must
    exactly equal a scalar encoder driven by the scalar trainer's final
    segmentations — positions, symbols, AND the vocab-convention token
    ids (alphabet sorted, merges at A+step-1, min-id dedup)."""
    from ocr_search_spark.ops.text_analysis import bpe_encode

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id long, text string"
    )
    got = sorted(
        (r.id, r.pos, r.sym_pos, r.token_id, r.symbol)
        for r in bpe_encode(df, n_merges=k).collect()
    )
    toks = {
        i: re.findall(r"[a-zа-яё0-9_]+", t.lower()) for i, t in enumerate(docs)
    }
    words = Counter(w for ws in toks.values() for w in ws)
    merges, segs = _scalar_bpe(words, k, with_segs=True)
    alpha = sorted({c for w in words for c in w})
    ids = {c: i for i, c in enumerate(alpha)}
    for step, _l, _r, merged, _cnt in merges:
        ids.setdefault(merged, len(alpha) + step - 1)
    want = sorted(
        (i, pos, sym_pos, ids[sym], sym)
        for i, ws in toks.items()
        for pos, w in enumerate(ws)
        for sym_pos, sym in enumerate(segs[w])
    )
    assert got == want
