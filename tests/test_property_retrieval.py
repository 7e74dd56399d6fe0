"""Property-based invariants for the round-5-close retrieval head.

Random ranked arms / vector pools are scored by scalar Python models of
RRF fusion and greedy MMR; `rrf_fuse` and `mmr_select` must reproduce
them exactly — both operate on exact-integer lattices, so the property
is equality, not tolerance. Few hypothesis examples (each runs Spark
jobs) but every example is a whole fusion/selection problem with ties,
disjoint arms and degenerate pools baked into the strategies.
"""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st

# small id space so arm overlap and rrf ties happen constantly
_ARM = st.lists(
    st.sampled_from(list("abcdef")), min_size=1, max_size=6, unique=True
)
_ARMS = st.lists(_ARM, min_size=1, max_size=3)

# tiny integer lattice for vectors: exact float conversion, repeated and
# opposite vectors common (sim ties and -1 cosines)
_VEC = st.tuples(
    st.integers(min_value=-2, max_value=2), st.integers(min_value=-2, max_value=2)
).filter(lambda v: v != (0, 0))
_POOL = st.lists(
    st.tuples(st.integers(min_value=0, max_value=900_000), _VEC),
    min_size=1,
    max_size=7,
)


def _scalar_rrf(arms, k0=60, scale=1_000_000_000):
    out = {}
    for arm in arms:
        for rank, doc in enumerate(arm, start=1):
            s, n = out.get(doc, (0, 0))
            out[doc] = (s + scale // (k0 + rank), n + 1)
    return out


def _cos_e6(a, b):
    dot = a[0] * b[0] + a[1] * b[1]
    na = math.sqrt(a[0] * a[0] + a[1] * a[1])
    nb = math.sqrt(b[0] * b[0] + b[1] * b[1])
    return round(round(dot / (na * nb), 6) * 1_000_000)


def _scalar_mmr(rows, k, lam):
    by_id = {i: v for i, (_, v) in enumerate(rows)}
    pool = {i: r for i, (r, _) in enumerate(rows)}
    sel: list[int] = []
    while pool and len(sel) < k:
        if not sel:
            pick = max(pool, key=lambda i: (pool[i], -i))
        else:

            def score(i):
                ms = max(_cos_e6(by_id[i], by_id[s]) for s in sel)
                return lam * pool[i] - (10000 - lam) * ms

            pick = max(pool, key=lambda i: (score(i), -i))
        sel.append(pick)
        del pool[pick]
    return sel


class TestRetrievalHeadMatchesScalarModels:
    @settings(max_examples=8, deadline=None)
    @given(arms=_ARMS, k0=st.sampled_from([0, 10, 60]))
    def test_rrf_fuse(self, spark, arms, k0):
        from ocr_search_spark.search.ranking import rrf_fuse

        dfs = [
            spark.createDataFrame(
                [(d, r) for r, d in enumerate(arm, start=1)],
                "doc_id string, rank int",
            )
            for arm in arms
        ]
        got = {
            r.doc_id: (r.rrf, r.n_arms)
            for r in rrf_fuse(dfs, k0=k0).collect()
        }
        assert got == _scalar_rrf(arms, k0=k0)

    @settings(max_examples=6, deadline=None)
    @given(pool=_POOL, lam=st.sampled_from([0, 3000, 7000, 10000]))
    def test_mmr_select(self, spark, pool, lam):
        from ocr_search_spark.ops.similarity import mmr_select

        df = spark.createDataFrame(
            [
                (i, rel, [float(v[0]), float(v[1])])
                for i, (rel, v) in enumerate(pool)
            ],
            "vec_id bigint, rel_e6 bigint, embedding array<float>",
        )
        k = min(4, len(pool))
        got = [
            r.vec_id for r in mmr_select(df, k=k, lambda_bp=lam).collect()
        ]
        assert got == _scalar_mmr(pool, k, lam)
