"""Property-based invariant for ratio-margin mining
(ops/similarity.py margin_mine): for arbitrary small vector sides, k,
and threshold, the mined pair set must EXACTLY equal a scalar
Artetxe-Schwenk model on the shared e6 integer lattice — including
trunc-div sign behavior on negative cosines, short-side kNN (fewer
than k candidates), and per-src argmax tie-breaks. No tolerance: the
mined set is the deterministic artifact a bitext pipeline ships.

Few hypothesis examples (each runs real Spark jobs), but each is a
whole two-sided mining problem; vectors are integer-component so the
double cosine is bit-identical between numpy and the JVM.
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

# integer components in [-3, 3], at least one nonzero (zero vectors
# have no cosine); dims small so the cross product stays tiny
_VEC = st.lists(
    st.integers(min_value=-3, max_value=3), min_size=3, max_size=3
).filter(lambda v: any(x != 0 for x in v))
_SIDE = st.lists(_VEC, min_size=1, max_size=5)


def _scalar(src_rows, tgt_rows, k, threshold_e6):
    def cos_e6(a, b):
        c = float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b)))
        q = Decimal(repr(c)).quantize(
            Decimal("0.000001"), rounding=ROUND_HALF_UP
        )
        return int(q * 1_000_000)

    def trunc_div(a, b):
        q = abs(a) // abs(b)
        return -q if (a < 0) != (b < 0) else q

    cross = {
        (si, ti): cos_e6(np.array(sv, dtype=float), np.array(tv, dtype=float))
        for si, sv in src_rows
        for ti, tv in tgt_rows
    }
    sum_x, kx = {}, {}
    for si, _ in src_rows:
        top = sorted(
            ((cross[(si, ti)], ti) for ti, _ in tgt_rows),
            key=lambda p: (-p[0], p[1]),
        )[:k]
        sum_x[si], kx[si] = sum(c for c, _ in top), len(top)
    sum_y, ky = {}, {}
    for ti, _ in tgt_rows:
        top = sorted(
            ((cross[(si, ti)], si) for si, _ in src_rows),
            key=lambda p: (-p[0], p[1]),
        )[:k]
        sum_y[ti], ky[ti] = sum(c for c, _ in top), len(top)
    out = []
    for si, _ in src_rows:
        best = None
        for ti, _ in tgt_rows:
            denom = sum_x[si] * ky[ti] + sum_y[ti] * kx[si]
            if denom <= 0:
                continue
            m = trunc_div(
                2 * cross[(si, ti)] * kx[si] * ky[ti] * 1_000_000, denom
            )
            cand = (-m, ti)
            if best is None or cand < best:
                best, best_row = cand, (si, ti, cross[(si, ti)], m)
        if best is not None and best_row[3] >= threshold_e6:
            out.append(best_row)
    return sorted(out)


@pytest.mark.usefixtures("spark")
class TestMarginMineProperty:
    @settings(max_examples=8, deadline=None)
    @given(
        src=_SIDE,
        tgt=_SIDE,
        k=st.integers(min_value=1, max_value=4),
        thr=st.sampled_from([-(10**9), 0, 900_000, 1_100_000]),
    )
    def test_mined_set_matches_scalar_model(self, spark, src, tgt, k, thr):
        from ocr_search_spark.ops.similarity import margin_mine

        src_rows = [(i, [float(x) for x in v]) for i, v in enumerate(src)]
        tgt_rows = [
            (100 + i, [float(x) for x in v]) for i, v in enumerate(tgt)
        ]
        sdf = spark.createDataFrame(
            src_rows, "vec_id long, embedding array<float>"
        )
        tdf = spark.createDataFrame(
            tgt_rows, "vec_id long, embedding array<float>"
        )
        got = sorted(
            tuple(r) for r in margin_mine(sdf, tdf, k=k, threshold_e6=thr).collect()
        )
        assert got == _scalar(src_rows, tgt_rows, k, thr)
