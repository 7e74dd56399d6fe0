"""Property-based invariants for fixed-length sequence packing.

A scalar Python model packs arbitrary (id, token_count) corpora; the
Spark operator must match it exactly — tiling (each doc's pieces cover
[0, n) contiguously), exact fill (every sequence except each group's
last holds exactly seq_len tokens), and zero-token drops. Few hypothesis
examples (Spark jobs are not free) but each example is a whole corpus.
"""

from __future__ import annotations

import hashlib

from hypothesis import given, settings
from hypothesis import strategies as st

_COUNTS = st.lists(st.integers(min_value=0, max_value=700), min_size=1, max_size=24)
_SEQ_LEN = st.sampled_from([16, 64, 256])
_GROUPS = st.sampled_from([1, 2, 4])


def _model(counts: list[int], seq_len: int, n_groups: int, salt: str = "pack"):
    """Scalar model of ops.sampling.pack_sequences."""
    rows = [(f"d{i:04d}", n) for i, n in enumerate(counts)]
    by_group: dict[int, list] = {}
    for did, n in rows:
        g = int(hashlib.md5(f"{salt}{did}".encode()).hexdigest()[:8], 16) % n_groups
        by_group.setdefault(g, []).append((did, n))
    out = set()
    for g, members in by_group.items():
        members.sort()  # id order
        cum = 0
        for did, n in members:
            start, cum = cum, cum + n
            if n == 0:
                continue
            for seq in range(start // seq_len, (cum - 1) // seq_len + 1):
                b = max(0, seq * seq_len - start)
                e = min(n, (seq + 1) * seq_len - start)
                out.add((did, n, g, seq, b, e))
    return out


@settings(max_examples=12, deadline=None)
@given(counts=_COUNTS, seq_len=_SEQ_LEN, n_groups=_GROUPS)
def test_pack_sequences_matches_scalar_model(spark, counts, seq_len, n_groups):
    from ocr_search_spark.ops.sampling import pack_sequences

    rows = [(f"d{i:04d}", n) for i, n in enumerate(counts)]
    df = spark.createDataFrame(rows, "doc_id string, n long")
    got = {
        (r.doc_id, r.tokens, r.shard_group, r.seq_idx, r.begin_tok, r.end_tok)
        for r in pack_sequences(
            df, "doc_id", "n", seq_len=seq_len, n_groups=n_groups
        ).collect()
    }
    assert got == _model(counts, seq_len, n_groups)
