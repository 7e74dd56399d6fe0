"""EML message extraction (operator E15).

Replicates ``EMLMSGExtractor._extract_eml`` (reference: app/services/
extractors/email.py:56-113): stdlib ``BytesParser(policy=default)``, the
fixed Russian header template (Тема/От  /Кому/Копия/Дата — note the literal
``"От  : "`` double space, email.py:102-108), first text/plain part as body
else HTML flattened with a newline separator (email.py:29-35, 94), and an
enumerated attachment-name list (email.py:96-112).

MSG (Outlook OLE) parsing lives in :mod:`.msg_extract` (operator E16, a
pure-stdlib CFB reader — the extract_msg/msg_parser packages the reference
uses are absent here).
"""

from __future__ import annotations

import re
from email import policy
from email.parser import BytesParser
from html.parser import HTMLParser


class _AllText(HTMLParser):
    """bs4 ``get_text(separator="\\n")`` analogue: every string node,
    unstripped, newline-joined (the reference's email HTML cleaner has no
    drop-tags and no strip — email.py:29-35)."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.parts: list[str] = []

    def handle_data(self, data: str) -> None:
        if data:
            self.parts.append(data)


def _email_html_to_text(html: str) -> str:
    if not html:
        return ""
    p = _AllText()
    try:
        p.feed(html)
        p.close()
    except Exception:
        return re.sub(r"<[^>]+>", "", html)  # reference fallback email.py:35
    return "\n".join(p.parts)


#: MS compound-file magic (an Outlook .msg container); as latin-1-mapped
#: str for the span data model's binary-kind convention
CFB_MAGIC = bytes((0xD0, 0xCF, 0x11, 0xE0, 0xA1, 0xB1, 0x1A, 0xE1))
CFB_MAGIC_STR = CFB_MAGIC.decode("latin-1")


def is_msg(raw: str | bytes) -> bool:
    """The reference's MSG sniff (email.py:45-50): CFB magic prefix."""
    if isinstance(raw, bytes):
        return raw.startswith(CFB_MAGIC)
    return isinstance(raw, str) and raw.startswith(CFB_MAGIC_STR)


def eml_or_msg_to_text(raw: str | bytes) -> str:
    """The reference's combined EMLMSGExtractor entry: sniff the CFB
    magic and route Outlook containers to the MSG kernel, everything
    else through the RFC-822 parser (email.py:45-50 dispatch)."""
    if raw and is_msg(raw):
        from .msg_extract import msg_to_text

        return msg_to_text(raw)
    return eml_to_text(raw)


def eml_to_text(raw: str | bytes) -> str:
    """Flatten one RFC-822 message to the reference's text template."""
    if not raw:
        return ""
    data = raw.encode("utf-8") if isinstance(raw, str) else raw
    try:
        msg = BytesParser(policy=policy.default).parsebytes(data)
    except Exception:
        return ""  # email.py:64-66

    def safe(v) -> str:
        return "" if v is None else str(v)

    text_part, html_part = "", ""
    for part in msg.walk():
        ctype = (part.get_content_type() or "").lower()
        if part.get_content_disposition() == "attachment":
            continue
        if ctype == "text/plain" and not text_part:
            try:
                text_part = part.get_content()
            except Exception:
                pass
        elif ctype == "text/html" and not html_part:
            try:
                html_part = part.get_content()
            except Exception:
                pass
    body = text_part or _email_html_to_text(html_part)

    try:
        atts = [a.get_filename() or "attachment" for a in msg.iter_attachments()]
    except Exception:
        atts = []

    lines = [
        f"Тема: {safe(msg.get('subject'))}",
        f"От  : {safe(msg.get('from'))}",
        f"Кому: {safe(msg.get('to'))}",
        f"Копия: {safe(msg.get('cc'))}",
        f"Дата: {safe(msg.get('date'))}",
    ]
    if body:
        lines.append("Тело письма:\n" + body)
    if atts:
        lines.append("Вложения:\n" + "\n".join(f"{i+1}. {n}" for i, n in enumerate(atts)))
    return "\n".join(lines)
