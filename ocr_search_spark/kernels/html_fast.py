"""Fast-path HTML visible-text scanner (same contract as html_extract.E2).

``html_to_text`` (stdlib HTMLParser) costs ~70% of the extraction kernel's
CPU; this module implements the identical observable contract with a single
compiled-regex scan:

* DROP_TAGS subtrees removed (depth-tracked, like ``decompose()``);
* ``script``/``style`` treated as CDATA containers (content skipped to the
  matching close tag, as tokenizers must);
* comments stripped; entities unescaped; each text node stripped, empties
  skipped, nodes joined with one space — ``get_text(" ", strip=True)``.

The slow parser in ``html_extract`` remains the *independent golden truth*:
the pipeline uses this fast path, the scalar reference implementation uses
the parser path, and the span-equality suite + a dedicated parity test keep
them identical. Any divergence is a test failure, never silent drift.

Known limitation vs the parser path: attribute values containing a literal
``>`` (quoted) end the tag early here — not emitted by any well-formed
serializer and absent from the corpus; the parity suite pins the behaviors
that matter.
"""

from __future__ import annotations

import re
from html import unescape

from .html_extract import DROP_TAGS, _VOID_TAGS

_TOKEN_RE = re.compile(
    r"<!--.*?(?:-->|$)"                 # comments
    r"|<!\[CDATA\[.*?(?:\]\]>|$)"       # CDATA sections
    r"|<!DOCTYPE[^>]*>"                 # doctype
    r"|<\?[^>]*>"                       # processing instructions
    r"|<\s*(/?)\s*([a-zA-Z][a-zA-Z0-9:-]*)[^>]*?(/?)\s*>",  # tags
    re.DOTALL | re.IGNORECASE,
)

_CDATA_TAGS = ("script", "style")

def html_to_text_fast(html: str) -> str:
    if not html:
        return ""
    parts: list[str] = []
    drop_depth = 0
    pos = 0
    out = parts.append
    lower = None  # full-doc lowercase computed lazily (CDATA scan only)

    for m in _TOKEN_RE.finditer(html):
        start = m.start()
        if start < pos:
            continue  # match inside a region already skipped (CDATA jump)
        if start > pos and drop_depth == 0:
            # strip first (C-level) as the emptiness prefilter; entities are
            # rare, so unescape only on '&' — its output is re-stripped since
            # entities can decode to whitespace (&nbsp;)
            seg = html[pos:start].strip()
            if seg:
                if "&" in seg:
                    seg = unescape(seg).strip()
                if seg:
                    out(seg)
        pos = m.end()

        closing, tag, selfclose = m.group(1, 2, 3)
        if tag is None:
            continue  # comment / doctype / CDATA / PI
        tag = tag.lower()
        if tag in _CDATA_TAGS and not closing and not selfclose:
            # CDATA container: skip straight to its close tag
            if lower is None:
                lower = html.lower()
            close = lower.find(f"</{tag}", pos)
            if tag in DROP_TAGS:
                pass  # content dropped entirely
            pos = len(html) if close == -1 else lower.find(">", close) + 1
            if pos == 0:  # no '>' after close tag
                pos = len(html)
            continue
        if tag in DROP_TAGS and tag not in _VOID_TAGS:
            if closing:
                if drop_depth > 0:
                    drop_depth -= 1
            elif not selfclose:
                drop_depth += 1

    if pos < len(html) and drop_depth == 0:
        seg = html[pos:].strip()
        if seg:
            if "&" in seg:
                seg = unescape(seg).strip()
            if seg:
                out(seg)
    return " ".join(parts)


def html_main_text_fast(
    html: str,
    max_link_density: float = 0.5,
    min_block_chars: int = 1,
) -> str:
    """Fast-scanner twin of :func:`html_extract.html_main_text` (E2 main-
    content heuristic: blocks segmented at block-level tags, anchor-text
    chars tracked, high-link-density blocks dropped as boilerplate).

    The parser-based ``html_main_text`` is the independent golden truth —
    the golden main-content parquet is generated from it and the parity
    suite keeps the two identical; the pipeline/query path uses this one.
    """
    if not html:
        return ""
    from .html_extract import _BLOCK_TAGS

    blocks: list[tuple[str, int, int]] = []  # (text, chars, link_chars)
    cur_parts: list[str] = []
    cur_chars = cur_link = 0
    drop_depth = anchor_depth = 0
    pos = 0
    lower = None

    def flush() -> None:
        nonlocal cur_parts, cur_chars, cur_link
        if cur_parts:
            blocks.append((" ".join(cur_parts), cur_chars, cur_link))
        cur_parts, cur_chars, cur_link = [], 0, 0

    for m in _TOKEN_RE.finditer(html):
        start = m.start()
        if start < pos:
            continue  # inside a CDATA region already skipped
        if start > pos and drop_depth == 0:
            seg = html[pos:start].strip()
            if seg and "&" in seg:
                seg = unescape(seg).strip()
            if seg:
                cur_parts.append(seg)
                cur_chars += len(seg)
                if anchor_depth:
                    cur_link += len(seg)
        pos = m.end()

        closing, tag, selfclose = m.group(1, 2, 3)
        if tag is None:
            continue  # comment / doctype / CDATA / PI
        tag = tag.lower()
        if tag in _CDATA_TAGS and not closing and not selfclose:
            if lower is None:
                lower = html.lower()
            close = lower.find(f"</{tag}", pos)
            pos = len(html) if close == -1 else lower.find(">", close) + 1
            if pos == 0:
                pos = len(html)
            continue
        if tag in DROP_TAGS and tag not in _VOID_TAGS:
            # parser's handle_starttag/endtag return before anchor/block
            # handling for drop tags — mirror that
            if closing:
                if drop_depth > 0:
                    drop_depth -= 1
            elif not selfclose:
                drop_depth += 1
            continue
        if tag == "a" and not selfclose:
            if closing:
                if anchor_depth > 0:
                    anchor_depth -= 1
            else:
                anchor_depth += 1
        if tag in _BLOCK_TAGS:
            flush()

    if pos < len(html) and drop_depth == 0:
        seg = html[pos:].strip()
        if seg and "&" in seg:
            seg = unescape(seg).strip()
        if seg:
            cur_parts.append(seg)
            cur_chars += len(seg)
            if anchor_depth:
                cur_link += len(seg)
    flush()
    kept = [
        text
        for text, chars, link_chars in blocks
        if chars >= min_block_chars and (link_chars / chars) <= max_link_density
    ]
    return " ".join(kept)
