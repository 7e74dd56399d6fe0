"""HTML visible-text extraction (operator E2) + main-content heuristics.

Replicates the reference's ``HTMLExtractor`` semantics
(reference: app/services/extractors/html.py:22-76):

* drop (with their entire subtree) the boilerplate tags in ``DROP_TAGS``
  (html.py:28-29, ``decompose()`` at 56-61);
* strip HTML comments (html.py:63-69);
* return the remaining visible text as ``get_text(separator=" ",
  strip=True)`` — each text node stripped, empties skipped, nodes joined
  with a single space (html.py:71-76);
* any parse error yields ``""`` rather than raising (html.py:49-51).

bs4/lxml are not available in this environment, so the parser is the stdlib
``html.parser.HTMLParser`` — same observable contract for the well-formed
markup our corpus emits.

On top of the parity extractor, :func:`html_main_text` adds the
text-density / link-density main-content heuristic called for by the
north_star (boilerplate block elimination à la Readability/JusText): block
elements whose anchor-text share exceeds ``max_link_density`` are dropped.
"""

from __future__ import annotations

from html.parser import HTMLParser

DROP_TAGS = frozenset(
    (
        "script",
        "style",
        "nav",
        "header",
        "footer",
        "aside",
        "noscript",
        "link",
        "meta",
        "form",
        "svg",
        "canvas",
        "iframe",
    )
)

# Void elements never get a closing tag; never push them on the drop stack.
_VOID_TAGS = frozenset(
    ("area", "base", "br", "col", "embed", "hr", "img", "input", "link",
     "meta", "param", "source", "track", "wbr")
)

# Elements that start a new text block for the link-density heuristic.
_BLOCK_TAGS = frozenset(
    ("p", "div", "li", "ul", "ol", "table", "tr", "td", "th", "h1", "h2",
     "h3", "h4", "h5", "h6", "article", "section", "main", "blockquote",
     "pre", "br")
)


class _TextCollector(HTMLParser):
    """Collects stripped text nodes outside DROP_TAGS subtrees."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self._drop_depth = 0
        self.parts: list[str] = []

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in DROP_TAGS and tag not in _VOID_TAGS:
            self._drop_depth += 1

    def handle_endtag(self, tag: str) -> None:
        if tag in DROP_TAGS and tag not in _VOID_TAGS and self._drop_depth > 0:
            self._drop_depth -= 1

    def handle_data(self, data: str) -> None:
        if self._drop_depth == 0:
            d = data.strip()
            if d:
                self.parts.append(d)

    # comments are simply not emitted -> stripped (html.py:63-69)


def html_to_text(html: str) -> str:
    """Visible text of ``html`` under the reference's extraction contract."""
    if not html:
        return ""
    collector = _TextCollector()
    try:
        collector.feed(html)
        collector.close()
    except Exception:
        return ""  # html.py:49-51 — parse failure yields empty text
    return " ".join(collector.parts)


class _BlockCollector(HTMLParser):
    """Segments visible text into blocks, tracking anchor-text length."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self._drop_depth = 0
        self._anchor_depth = 0
        self._cur_parts: list[str] = []
        self._cur_link_chars = 0
        self._cur_chars = 0
        self.blocks: list[tuple[str, int, int]] = []  # (text, chars, link_chars)

    def _flush(self) -> None:
        if self._cur_parts:
            self.blocks.append(
                (" ".join(self._cur_parts), self._cur_chars, self._cur_link_chars)
            )
        self._cur_parts = []
        self._cur_link_chars = 0
        self._cur_chars = 0

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in DROP_TAGS and tag not in _VOID_TAGS:
            self._drop_depth += 1
            return
        if tag == "a":
            self._anchor_depth += 1
        if tag in _BLOCK_TAGS:
            self._flush()

    def handle_endtag(self, tag: str) -> None:
        if tag in DROP_TAGS and tag not in _VOID_TAGS:
            if self._drop_depth > 0:
                self._drop_depth -= 1
            return
        if tag == "a" and self._anchor_depth > 0:
            self._anchor_depth -= 1
        if tag in _BLOCK_TAGS:
            self._flush()

    def handle_data(self, data: str) -> None:
        if self._drop_depth:
            return
        d = data.strip()
        if not d:
            return
        self._cur_parts.append(d)
        self._cur_chars += len(d)
        if self._anchor_depth:
            self._cur_link_chars += len(d)

    def close(self) -> None:  # flush trailing block
        super().close()
        self._flush()


def html_main_text(
    html: str,
    max_link_density: float = 0.5,
    min_block_chars: int = 1,
) -> str:
    """Main-content text: visible blocks filtered by link density.

    A block whose anchor-text chars / total chars ratio exceeds
    ``max_link_density`` (e.g. a nav bar of links) is treated as boilerplate
    and dropped; surviving blocks are joined with a single space.
    """
    if not html:
        return ""
    collector = _BlockCollector()
    try:
        collector.feed(html)
        collector.close()
    except Exception:
        return ""
    kept = [
        text
        for text, chars, link_chars in collector.blocks
        if chars >= min_block_chars and (link_chars / chars) <= max_link_density
    ]
    return " ".join(kept)
