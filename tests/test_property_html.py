"""Property-based parity for the HTML fast scanner vs the stdlib-parser
golden path: random tag soups (nested, unclosed, interleaved, entity-laden,
drop-container and CDATA tags, self-closed voids) must produce identical
output from both the visible-text extractors (E2 contract) and the
main-content heuristic (link-density block filter). No SparkSession needed —
these are scalar kernels; the Spark-side plumbing is tested in
test_kernels/test_pipeline.

Generation deliberately stays inside the fast path's documented contract:
no attribute values containing a literal '>' (html_fast module docstring
records that divergence; absent from any well-formed serializer and from
the corpus).
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from ocr_search_spark.kernels.html_extract import html_main_text, html_to_text
from ocr_search_spark.kernels.html_fast import html_main_text_fast, html_to_text_fast

_TEXTS = [
    "word",
    "два слова",
    "a b  c",
    "&amp; x",
    "&nbsp;",
    "&lt;3",
    " lead",
    "trail ",
    "",
    "x&y",
]

_TAGS = [
    "p", "div", "li", "ul", "span", "a", "h1", "td", "table", "blockquote",
    "nav", "header", "footer", "aside", "form", "iframe", "svg",
    "script", "style",
]

_VOIDS = ["br", "img", "input", "hr", "meta"]


def _open(tag: str) -> str:
    return f"<{tag}>"


def _open_attr(tag: str) -> str:
    return f'<{tag} class="c1" href="/x?q=1">'


def _close(tag: str) -> str:
    return f"</{tag}>"


_BOGUS = [
    "<!-- comment -->",
    "<!DOCTYPE html>",
    "<!-- unterminated",
    "<!--",
    "<![CDATA[x]]>",
    "<![CDATA[ truncated",
    "<!bogus decl>",
    "<!>",
    "<>",
    "< p>",
    "</>",
    "</ >",
    "</5>",
    "<5>",
    "<-->",
    "<?pi >",
    "<?pi truncated",
    "<",
    "</",
    "<p",
    "<div attr",
    "<script>never closed",
    "<a/>",
]

_piece = st.one_of(
    st.sampled_from(_TEXTS),
    st.sampled_from(_TAGS).map(_open),
    st.sampled_from(_TAGS).map(_open_attr),
    st.sampled_from(_TAGS).map(_close),
    st.sampled_from(_VOIDS).map(_open),
    st.sampled_from(_VOIDS).map(lambda t: f"<{t}/>"),
    st.sampled_from(_BOGUS),
)

_soups = st.lists(_piece, min_size=0, max_size=40).map("".join)


class TestHtmlFastParityProperties:
    @settings(max_examples=200, deadline=None, derandomize=True)
    @given(_soups)
    def test_visible_text_parity(self, html):
        assert html_to_text_fast(html) == html_to_text(html)

    @settings(max_examples=200, deadline=None, derandomize=True)
    @given(_soups)
    def test_main_content_parity(self, html):
        assert html_main_text_fast(html) == html_main_text(html)
