"""Fast-path HTML visible-text scanner (same contract as html_extract.E2).

``html_to_text`` (stdlib HTMLParser) costs ~70% of the extraction kernel's
CPU; this module implements the identical observable contract with a single
compiled-regex scan:

* DROP_TAGS subtrees removed (depth-tracked, like ``decompose()``);
* ``script``/``style`` treated as CDATA containers (content skipped to the
  matching close tag, as tokenizers must);
* comments, doctypes, processing instructions, marked sections, BOGUS
  declarations (``<!anything>``) and bogus end tags (``</5>``, ``</ >``)
  stripped exactly like HTMLParser;
* a ``<`` that starts no recognizable construct (``a< b``, ``<5>``, ``<>``,
  ``<д``) is emitted as a lone ``"<"`` data node with scanning resuming at
  the next character — HTMLParser's invalid-markup fallback;
* an INCOMPLETE construct at EOF (``<!-- unterminated``, ``<p``) mirrors
  the parser's close() flush: everything through the next ``>`` as one
  data node, else up to the next ``<``, else the lone ``<``;
* entities unescaped; each text node stripped, empties skipped, nodes
  joined with one space — ``get_text(" ", strip=True)``.

The slow parser in ``html_extract`` remains the *independent golden truth*:
the pipeline uses this fast path, the scalar reference implementation uses
the parser path, and the span-equality suite + dedicated parity tests
(hand cases, corpus, and hypothesis tag-soup properties in
``tests/test_property_html.py``) keep them identical. Any divergence is a
test failure, never silent drift.

The scan loop is INLINED in both consumers (visible-text and main-content)
rather than shared through a generator: the event-iterator formulation
measured 1.4× slower on corpus HTML, and this function is the single
hottest spot of the extraction pipeline.

Known limitations vs the parser path (absent from well-formed serializers
and from the corpus; the parity suite pins the behaviors that matter):
attribute values containing a literal ``>`` end the tag early here, and
exotic marked-section bodies containing ``]>`` before their real ``]]>``
terminate early.
"""

from __future__ import annotations

import re
from html import unescape

from .html_extract import DROP_TAGS, _VOID_TAGS

# Ordered alternatives mirroring HTMLParser's dispatch in goahead():
# complete comment / marked section / doctype / bogus declaration / PI /
# end tag (incl. bogus ``</...>`` and ``</>``) / start tag — then the
# lone-'<' fallback. None of the bracketed constructs match without their
# terminator, so truncation at EOF falls through to the lone-'<' rule
# exactly like the parser's close() flush.
_TOKEN_RE = re.compile(
    r"<!--.*?-->"                          # comments
    r"|<!\[.*?\]>"                         # marked sections incl. CDATA
    r"|<!DOCTYPE[^>]*>"                    # doctype
    r"|<!(?!--|\[)[^>]*>"                  # bogus declaration <!...> (but an
                                           # UNTERMINATED comment/section must
                                           # fall to the EOF-flush rule, like
                                           # the parser — hence the lookahead)
    r"|<\?[^>]*>"                          # processing instructions
    r"|</\s*([a-zA-Z][a-zA-Z0-9:._-]*)?[^>]*>"       # end tag / bogus </..> / </>
    r"|<([a-zA-Z][a-zA-Z0-9:._-]*)[^>]*?(/?)\s*>"    # start tag
    r"|<",                                 # invalid / incomplete fallback
    re.DOTALL | re.IGNORECASE,
)

_CDATA_TAGS = ("script", "style")

#: HTMLParser's CDATA close rule: candidate ``</ \s* name`` must ALSO parse
#: as a real end tag of that exact name (endtagfind: optional ws, then '>').
#: '</scripty>' (wrong name) and '</script x>' (attribute junk) stay data;
#: '</ script>' closes. Searched on the lowered document.
_CDATA_CLOSE_RE = {t: re.compile(rf"</\s*{t}\s*>") for t in _CDATA_TAGS}


def _cdata_resume(lower: str, tag: str, pos: int, n: int) -> int:
    """Position just past the CDATA container's real close tag (or EOF)."""
    m = _CDATA_CLOSE_RE[tag].search(lower, pos)
    return n if m is None else m.end()


def _lone_lt(html: str, i: int, n: int) -> tuple[str, int]:
    """HTMLParser's fallback for a '<' that matched no complete construct:
    returns (data_chunk, resume_pos).

    A construct-looking '<' (ASCII letter / '!' / '/' / '?' next — the
    parser's tagfind is ASCII-only, unicode isalpha() letters are invalid
    markup) is an INCOMPLETE construct at EOF: flush through the next '>'
    as one data node, else up to the next '<', else the lone '<'. Anything
    else is invalid markup: the lone '<' with scanning resuming at i+1."""
    nxt = html[i + 1] if i + 1 < n else ""
    if nxt and ("a" <= nxt <= "z" or "A" <= nxt <= "Z" or nxt in "!/?"):
        k = html.find(">", i + 1)
        if k >= 0:
            return html[i : k + 1], k + 1
        k2 = html.find("<", i + 1)
        if k2 >= 0:
            return html[i:k2], k2
    return "<", i + 1


def _clean(seg: str) -> str:
    """Strip; unescape only on '&' (entities can decode to whitespace, so
    re-strip after)."""
    seg = seg.strip()
    if seg and "&" in seg:
        seg = unescape(seg).strip()
    return seg


def html_to_text_fast(html: str) -> str:
    if not html:
        return ""
    parts: list[str] = []
    drop_depth = 0
    pos = 0
    n = len(html)
    lower = None
    out = parts.append

    it = _TOKEN_RE.finditer(html)
    restart = True
    while restart:
        restart = False
        for m in it:
            start = m.start()
            mend = m.end()
            if mend <= pos:
                continue  # fully inside a consumed region (CDATA/EOF flush)
            if start < pos:
                # token STRADDLES a consumed-region boundary (e.g. a
                # comment spanning the </script> close): the parser
                # re-tokenizes from the resume position, so must we —
                # otherwise the straddled tail is flushed as raw text and
                # its tag effects (drops, anchors, blocks) are lost
                it = _TOKEN_RE.finditer(html, pos)
                restart = True
                break
            if start > pos and drop_depth == 0:
                # _clean inlined on the hot data path (no '&' fast case)
                seg = html[pos:start].strip()
                if seg:
                    if "&" in seg:
                        seg = unescape(seg).strip()
                        if seg:
                            out(seg)
                    else:
                        out(seg)
            pos = mend

            # lone '<' is the only 1-char token: span test avoids building
            # the group(0) string for every tag/comment
            if mend - start == 1:
                chunk, pos = _lone_lt(html, start, n)
                if drop_depth == 0:
                    seg = _clean(chunk)
                    if seg:
                        out(seg)
                continue
            end_name, start_name, selfclose = m.group(1, 2, 3)
            if start_name is not None:
                tag = start_name.lower()
                if tag in _CDATA_TAGS and not selfclose:
                    # CDATA container: skip to its REAL close tag
                    if lower is None:
                        lower = html.lower()
                    pos = _cdata_resume(lower, tag, pos, n)
                    continue  # start+end cancel for drop accounting
                if tag in DROP_TAGS and tag not in _VOID_TAGS and not selfclose:
                    drop_depth += 1  # selfclose: +1 then -1 — net no-op
            elif end_name is not None:
                tag = end_name.lower()
                if tag in DROP_TAGS and tag not in _VOID_TAGS and drop_depth > 0:
                    drop_depth -= 1
            # else: comment / declaration / PI / bogus end tag — dropped

    if pos < n and drop_depth == 0:
        seg = _clean(html[pos:])
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
    A self-closed tag behaves like start immediately followed by end
    (HTMLParser's handle_startendtag runs both handlers).
    """
    if not html:
        return ""
    from .html_extract import _BLOCK_TAGS

    blocks: list[tuple[str, int, int]] = []  # (text, chars, link_chars)
    cur_parts: list[str] = []
    cur_chars = cur_link = 0
    drop_depth = anchor_depth = 0
    pos = 0
    n = len(html)
    lower = None

    def emit(raw: str) -> None:
        nonlocal cur_chars, cur_link
        seg = _clean(raw)
        if seg:
            cur_parts.append(seg)
            cur_chars += len(seg)
            if anchor_depth:
                cur_link += len(seg)

    def flush() -> None:
        nonlocal cur_parts, cur_chars, cur_link
        if cur_parts:
            blocks.append((" ".join(cur_parts), cur_chars, cur_link))
        cur_parts, cur_chars, cur_link = [], 0, 0

    it = _TOKEN_RE.finditer(html)
    restart = True
    while restart:
        restart = False
        for m in it:
            start = m.start()
            mend = m.end()
            if mend <= pos:
                continue
            if start < pos:
                # straddling token — re-tokenize from the resume position
                # (see html_to_text_fast)
                it = _TOKEN_RE.finditer(html, pos)
                restart = True
                break
            if start > pos and drop_depth == 0:
                emit(html[pos:start])
            pos = mend

            if mend - start == 1:  # lone '<' (see html_to_text_fast)
                chunk, pos = _lone_lt(html, start, n)
                if drop_depth == 0:
                    emit(chunk)
                continue
            end_name, start_name, selfclose = m.group(1, 2, 3)
            if start_name is not None:
                tag = start_name.lower()
                if tag in _CDATA_TAGS and not selfclose:
                    if lower is None:
                        lower = html.lower()
                    pos = _cdata_resume(lower, tag, pos, n)
                    continue  # drop-start+end cancel; no anchor/block effect
                # parser's handle_starttag returns before anchor/block
                # handling for drop tags — mirror that (selfclose: +1/-1)
                if tag in DROP_TAGS and tag not in _VOID_TAGS:
                    if not selfclose:
                        drop_depth += 1
                    continue
                if tag == "a" and not selfclose:
                    anchor_depth += 1
                if tag in _BLOCK_TAGS:
                    flush()
                    if selfclose:
                        flush()  # startendtag flushes in both handlers
            elif end_name is not None:
                tag = end_name.lower()
                if tag in DROP_TAGS and tag not in _VOID_TAGS:
                    if drop_depth > 0:
                        drop_depth -= 1
                    continue
                if tag == "a" and anchor_depth > 0:
                    anchor_depth -= 1
                if tag in _BLOCK_TAGS:
                    flush()

    if pos < n and drop_depth == 0:
        emit(html[pos:])
    flush()
    kept = [
        text
        for text, chars, link_chars in blocks
        if chars >= min_block_chars and (link_chars / chars) <= max_link_density
    ]
    return " ".join(kept)
