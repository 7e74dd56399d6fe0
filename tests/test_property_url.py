"""Property-based parity for canonical_url_expr.

An INDEPENDENT scalar Python model (``re`` module, not Spark) implements
the documented canonicalisation chain; the codegen'd column expression
must agree exactly on arbitrary ASCII URL-ish inputs — structured
scheme://host/path?query#frag compositions and raw junk strings alike.
ASCII-only generation is deliberate: the documented engine-parity
contract covers percent-encoded ASCII query strings (Java UTF-16
code-unit ordering and Python code-point ordering agree on ASCII).
"""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st

_TRACKING = re.compile(
    r"^(utm_[a-z0-9_]*|fbclid|gclid|msclkid|yclid|mc_cid|mc_eid)="
)
_PREFIX = re.compile(r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*")


def _model(u: str) -> str:
    u = re.sub(r"#.*", "", u)
    m = _PREFIX.match(u)
    u = (m.group(0).lower() if m else "") + _PREFIX.sub("", u)
    u = re.sub(r"^(https?://)www\.", r"\1", u)
    for pat in (
        r"^(http://[^/?#:]+):80([/?#].*)?$",
        r"^(https://[^/?#:]+):443([/?#].*)?$",
    ):
        u = re.sub(pat, lambda m: m.group(1) + (m.group(2) or ""), u)
    base = re.sub(r"([^/])/$", r"\1", re.sub(r"\?.*", "", u))
    mq = re.search(r"\?(.*)", u)
    parts = sorted(
        p
        for p in (mq.group(1).split("&") if mq else [])
        if p and not _TRACKING.match(p)
    )
    return base + ("?" + "&".join(parts) if parts else base[:0])


_HOSTCH = "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789.-"
_PATHCH = _HOSTCH + "_~%/+,"
_QCH = _HOSTCH + "_~%=+&"

_STRUCTURED = st.builds(
    lambda scheme, www, host, port, path, slash, query, frag: (
        f"{scheme}://{'www.' if www else ''}{host}{port}{path}"
        f"{'/' if slash else ''}{query}{frag}"
    ),
    st.sampled_from(["http", "https", "HTTP", "HTTPS", "ftp"]),
    st.booleans(),
    st.text(alphabet=_HOSTCH, min_size=1, max_size=12),
    st.sampled_from(["", ":80", ":443", ":8080"]),
    st.text(alphabet=_PATHCH, max_size=10).map(
        lambda p: "/" + p if p else ""
    ),
    st.booleans(),
    st.text(alphabet=_QCH, max_size=14).map(lambda q: "?" + q if q else ""),
    st.sampled_from(["", "#x", "#frag/ment?q=1"]),
)
_JUNK = st.text(
    alphabet=_HOSTCH + ":/?#&=_",
    min_size=1,
    max_size=24,
)
_URL = st.one_of(_STRUCTURED, _JUNK)


class TestUrlCanonProperty:
    @settings(max_examples=12, deadline=None)
    @given(st.lists(_URL, min_size=1, max_size=24))
    def test_matches_scalar_model(self, spark, urls):
        from pyspark.sql import functions as F

        from ocr_search_spark.ops.scrub import canonical_url_expr

        rows = [(i, u) for i, u in enumerate(urls)]
        df = spark.createDataFrame(rows, "i long, url string").select(
            "i", canonical_url_expr("url").alias("canon")
        )
        got = {r["i"]: r["canon"] for r in df.collect()}
        for i, u in rows:
            assert got[i] == _model(u), repr(u)
