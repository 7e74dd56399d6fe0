"""Property-based invariant for the integer-lattice Lloyd trainer
(ops/similarity.py kmeans_train): for arbitrary small vector sets the
full training run — md5-seeded init, BIGINT distances, (d2, cid)
argmin, floor-division means, empty-cluster carry, final sizes and
inertia and centroid arrays — must EXACTLY equal a scalar model. No
tolerance anywhere: engine-reproducible training is the operator's
entire contract.
"""

from __future__ import annotations

import hashlib
import math

from hypothesis import given, settings
from hypothesis import strategies as st

_COMP = st.integers(min_value=-400, max_value=400).map(lambda v: v / 1000.0)
_VEC = st.lists(_COMP, min_size=3, max_size=3)
_ROWS = st.lists(_VEC, min_size=2, max_size=12)


def _scalar(rows, k, iters, scale_bits=20):
    s = 1 << scale_bits
    q = {i: [math.floor(x * s) for x in v] for i, v in rows}
    order = sorted(q, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))
    cents = {c: list(q[i]) for c, i in enumerate(order[:k])}

    def assign():
        return {
            i: min(
                (sum((a - b) * (a - b) for a, b in zip(v, cv)), c)
                for c, cv in cents.items()
            )
            for i, v in q.items()
        }

    for _ in range(iters):
        a = assign()
        sums, cnts = {}, {}
        for i, (_, c) in a.items():
            cnts[c] = cnts.get(c, 0) + 1
            acc = sums.setdefault(c, [0] * len(q[i]))
            for j, x in enumerate(q[i]):
                acc[j] += x
        for c in sums:
            cents[c] = [sv // cnts[c] for sv in sums[c]]
    a = assign()
    stats = {}
    for i, (d2, c) in a.items():
        sz, inr = stats.get(c, (0, 0))
        stats[c] = (sz + 1, inr + d2)
    return {c: (*stats.get(c, (0, 0)), cents[c]) for c in cents}


@settings(max_examples=5, deadline=None)
@given(vecs=_ROWS, k=st.integers(min_value=1, max_value=4),
       iters=st.integers(min_value=0, max_value=3))
def test_kmeans_train_matches_scalar_lloyd(spark, vecs, k, iters):
    from ocr_search_spark.ops.similarity import kmeans_train

    rows = [(i, v) for i, v in enumerate(vecs)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        r.cluster_id: (r.size, r.inertia, list(r.centroid))
        for r in kmeans_train(emb, k=k, n_iters=iters).collect()
    }
    assert got == _scalar(rows, k, iters)
