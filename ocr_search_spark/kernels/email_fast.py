"""Fast EML scanner — hot-path twin of :mod:`.email_extract` (E15).

``BytesParser(policy=default)`` spends ~90% of its time in the
``headerregistry`` value parsers (measured 1.75 ms/span — 26× the HTML
kernel), which doubled end-to-end extraction cost when email entered the
corpus mix at 2%. This module is the ``html_fast`` pattern applied to
EML: a hand-rolled header/MIME scanner for the common shapes, with a
conservative **bail-out to the full stdlib parser** whenever anything
unusual appears — nested multipart, exotic transfer encodings, unknown
charsets, parse errors. The golden path (kernels/reference_impl.py)
keeps the stdlib ``eml_to_text``, so the two implementations stay
independent and the span-equality suite + parity tests pin them to each
other (same discipline as html_extract vs html_fast).

Replicated ``policy=default`` observables (parity-tested):

* RFC2047 encoded-word decoding in Subject/From/To/Cc;
* Date headers re-rendered from the parsed datetime (the stdlib's
  DateHeader corrects a wrong weekday name — so must we);
* first non-attachment text/plain part as body, else text/html
  flattened with the shared ``_email_html_to_text``;
* attachment filenames enumerated in part order.
"""

from __future__ import annotations

import quopri
import re
from base64 import b64decode
from email.header import decode_header, make_header
from email.utils import format_datetime, parsedate_to_datetime

from .email_extract import _email_html_to_text, eml_to_text

_OK_CTE = {None, "", "7bit", "8bit", "binary", "base64", "quoted-printable"}

# first EMPTY line ends the head — including a blank line at position 0
# (feedparser semantics: '\n\nx' has empty headers and body '\nx')
_HEAD_SPLIT = re.compile(r"(?:^|\r?\n)\r?\n")
_LINE_SPLIT = re.compile(r"\r?\n")
_ENCODED_WORD = re.compile(r"=\?")
_FILENAME = re.compile(r'filename\s*=\s*(?:"([^"]*)"|([^;\s]+))', re.I)
_NAME = re.compile(r'name\s*=\s*(?:"([^"]*)"|([^;\s]+))', re.I)
_CHARSET = re.compile(r'charset\s*=\s*(?:"([^"]*)"|([^;\s]+))', re.I)
_BOUNDARY = re.compile(r'boundary\s*=\s*(?:"([^"]*)"|([^;\s]+))', re.I)
_SIMPLE_ADDR = re.compile(r'[^\s<>,;()"\\\[\]:@]+@[^\s<>,;()"\\\[\]:@]+')


def _parse_headers(head: str) -> dict[str, str] | None:
    """Unfold and collect first occurrence of each header (lower-cased
    name). Returns None on malformed head (no colon on a non-continuation
    line) — caller bails to the stdlib parser."""
    headers: dict[str, str] = {}
    name = None
    for line in _LINE_SPLIT.split(head):
        if not line:
            continue
        if line[0] in " \t":
            if name is None:
                return None
            # unfolding removes ONLY the newline: the continuation line's
            # own whitespace is preserved (policy=default: 'a\n  b ' ->
            # 'a  b ')
            headers[name] += line
            continue
        i = line.find(":")
        if i <= 0:
            return None
        raw_name = line[:i]
        # feedparser's header-name charset: printable ASCII minus colon
        # (and no spaces) — anything else makes the stdlib treat the line
        # as body start, so bail and let it decide
        if not all(0x21 <= ord(c) <= 0x7E for c in raw_name):
            return None
        name = raw_name.lower()
        if name not in headers:
            # leading WSP after the colon is dropped, trailing kept
            headers[name] = line[i + 1 :].lstrip(" \t")
        else:
            name = f"__dup_{name}"  # keep first value, swallow continuations
            headers.setdefault(name, "")
    return headers


def _decode_hdr(v: str) -> str | None:
    """RFC2047 decode matching policy=default's unstructured parsing for
    the simple shapes; None → bail."""
    if not _ENCODED_WORD.search(v):
        return v
    try:
        return str(make_header(decode_header(v)))
    except Exception:
        return None


def _render_date(v: str) -> str | None:
    """policy=default's DateHeader re-renders from the parsed datetime
    (corrects weekday names); replicate via parsedate + format."""
    try:
        return format_datetime(parsedate_to_datetime(v))
    except Exception:
        return None


def _decode_body(payload: str, cte: str, ctype_params: str) -> str | None:
    """Decode one text part exactly like ``get_text_content``: charset
    defaults to us-ascii and decoding ALWAYS uses errors='replace' (the
    stdlib content manager never raises on bad bytes — an undeclared
    utf-8 body becomes per-byte U+FFFD, and so must ours)."""
    cte = (cte or "").strip().lower()
    if cte not in _OK_CTE:
        return None
    m = _CHARSET.search(ctype_params)
    charset = (m.group(1) or m.group(2)).strip().lower() if m else "us-ascii"
    try:
        if cte == "base64":
            data = b64decode(re.sub(r"\s+", "", payload))
        elif cte == "quoted-printable":
            data = quopri.decodestring(payload.encode("utf-8"))
        else:  # 7bit/8bit/binary: the span model carries str; the wire
            # form the stdlib parser sees is its utf-8 encoding
            data = payload.encode("utf-8")
        return data.decode(charset, errors="replace")
    except Exception:
        return None


def _fast_parse(raw: str) -> str | None:
    """One message → the reference text template, or None to bail."""
    m = _HEAD_SPLIT.search(raw)
    if m is None:
        head, body_raw = raw, ""
    else:
        head, body_raw = raw[: m.start()], raw[m.end() :]
    headers = _parse_headers(head)
    if headers is None:
        return None

    def hdr(name: str) -> str | None:
        v = headers.get(name)
        return None if v is None else _decode_hdr(v)

    subject, frm, to, cc = hdr("subject"), hdr("from"), hdr("to"), hdr("cc")
    # AddressHeader re-renders anything that isn't a bare addr-spec
    # (display names, groups, quoting of unparsable values) — bail unless
    # the raw value is a single simple token@token (or absent/empty)
    for h in ("from", "to", "cc"):
        v = headers.get(h)
        if v and not _SIMPLE_ADDR.fullmatch(v):
            return None
    date = None
    if "date" in headers:
        date = _render_date(headers["date"])
        if date is None:
            return None

    ctype_full = headers.get("content-type", "text/plain")
    ctype = ctype_full.split(";", 1)[0].strip().lower()
    params = ctype_full.split(";", 1)[1] if ";" in ctype_full else ""
    cte = headers.get("content-transfer-encoding")

    body = ""
    atts: list[str] = []
    if ctype.startswith("multipart/"):
        bm = _BOUNDARY.search(params)
        if not bm:
            return None
        boundary = (bm.group(1) or bm.group(2)).strip()
        text_part, html_part = None, None
        # split on delimiter lines; first chunk is the preamble
        chunks = re.split(
            r"(?:^|\r?\n)--" + re.escape(boundary) + r"(--)?[ \t]*(?:\r?\n|$)",
            body_raw,
        )
        # re.split with one group interleaves the terminator markers
        parts = [c for c in chunks[1:] if c is not None and c != "--"]
        for part in parts:
            if not part.strip():
                continue
            pm = _HEAD_SPLIT.search(part)
            if pm is None:
                phead, pbody = part, ""
            else:
                phead, pbody = part[: pm.start()], part[pm.end() :]
            ph = _parse_headers(phead)
            if ph is None:
                return None
            pct_full = ph.get("content-type", "text/plain")
            pct = pct_full.split(";", 1)[0].strip().lower()
            pparams = pct_full.split(";", 1)[1] if ";" in pct_full else ""
            if pct.startswith("multipart/") or pct == "message/rfc822":
                return None  # nested structure -> stdlib parser
            disp = (ph.get("content-disposition") or "").strip()
            if disp.split(";", 1)[0].strip().lower() == "attachment":
                fn = _FILENAME.search(disp) or _NAME.search(pct_full)
                atts.append(
                    (fn.group(1) or fn.group(2)).strip() if fn else "attachment"
                )
                continue
            if pct == "text/plain" and text_part is None:
                text_part = _decode_body(
                    pbody, ph.get("content-transfer-encoding", ""), pparams
                )
                if text_part is None:
                    return None
            elif pct == "text/html" and html_part is None:
                html_part = _decode_body(
                    pbody, ph.get("content-transfer-encoding", ""), pparams
                )
                if html_part is None:
                    return None
        body = (
            text_part
            if text_part is not None
            else _email_html_to_text(html_part or "")
        )
    elif ctype == "message/rfc822":
        return None
    else:
        # stdlib behavior: an invalid/absent content-type defaults to
        # text/plain; any OTHER single-part type (application/*, image/*)
        # is skipped by the text/plain-or-html walk, leaving body empty
        if not ctype or "/" not in ctype:
            ctype = "text/plain"
        if ctype == "text/plain":
            decoded = _decode_body(body_raw, cte or "", params)
            if decoded is None:
                return None
            body = decoded
        elif ctype == "text/html":
            decoded = _decode_body(body_raw, cte or "", params)
            if decoded is None:
                return None
            body = _email_html_to_text(decoded)
        else:
            body = ""

    if subject is None or frm is None or to is None or cc is None:
        # a present-but-undecodable header bailed above; absent headers
        # render as "" exactly like safe(msg.get(...))
        subject = subject or ("" if "subject" not in headers else None)
        frm = frm or ("" if "from" not in headers else None)
        to = to or ("" if "to" not in headers else None)
        cc = cc or ("" if "cc" not in headers else None)
        if None in (subject, frm, to, cc):
            return None

    lines = [
        f"Тема: {subject or ''}",
        f"От  : {frm or ''}",
        f"Кому: {to or ''}",
        f"Копия: {cc or ''}",
        f"Дата: {date or ''}",
    ]
    if body:
        lines.append("Тело письма:\n" + body)
    if atts:
        lines.append(
            "Вложения:\n" + "\n".join(f"{i+1}. {n}" for i, n in enumerate(atts))
        )
    return "\n".join(lines)


def eml_to_text_fast(raw: str | bytes) -> str:
    """Drop-in fast twin of :func:`.email_extract.eml_or_msg_to_text`:
    same CFB sniff for Outlook containers, fast scanner for RFC-822."""
    if not raw:
        return ""
    from .email_extract import is_msg

    if is_msg(raw):
        from .msg_extract import msg_to_text

        return msg_to_text(raw)
    if isinstance(raw, bytes):
        try:
            raw = raw.decode("utf-8")
        except UnicodeDecodeError:
            return eml_to_text(raw)
    try:
        out = _fast_parse(raw)
    except Exception:
        out = None
    return eml_to_text(raw) if out is None else out
