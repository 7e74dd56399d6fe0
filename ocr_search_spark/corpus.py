"""Deterministic interleaved text+media corpus (BASELINE.json input_hint).

Builds the pipeline's input table::

    documents(doc_id string,
              spans array<struct<kind:string, text:string,
                                 media_ref:string, offset:int>>)

Documents are derived *deterministically* (SHA-1-seeded LCG — no global RNG
state) from the driver-provided base texts in
``/root/testdata/sf*/documents.parquet``, following the FIXTURES.md §4
recipe: mixed-kind spans (txt 24 / html 23 / pdf 20 / docx 10 / image 10 /
msg 2 / rtf 2 / xls 2 / email 2 / uns 5 — msg spans are real CFB containers
built by kernels.cfb_build, latin-1-mapped; rtf spans carry control words,
dropped destination groups and cp1251/``\\uN`` escapes; xls spans carry the
JSON workbook convention of kernels.xls_extract; email spans are raw RFC-822
MIME with RFC2047 headers, 8-bit utf-8 bodies, HTML-only variants and
base64 attachments), a 1% long tail of 64–256-page PDF
documents (the skew / giant-PDF
case, cf. reference pdf_fast.py:222-223), and injected normalization
triggers (hyphen line breaks, single newlines, newline runs, NBSP, tabs,
control chars, CRLF — exercising bytes_xtractor.py:23-39), with Cyrillic
vocabulary mixed in (the reference is RU-centric, extractors/base.py:24).

``build_document(i, base_texts)`` is the single source of truth; the local
(pytest) and distributed (Spark ``mapInPandas``) builders both call it, so
a corpus is identical regardless of how it was materialized.
"""

from __future__ import annotations

import hashlib
from typing import Any, Iterator

import pandas as pd

SPANS_IN_SCHEMA = (
    "doc_id string, "
    "spans array<struct<kind:string,text:string,media_ref:string,offset:int>>"
)

#: docs per scale factor (FIXTURES.md §4)
SF_DOCS = {"0.001": 1_000, "0.01": 10_000, "0.1": 100_000}

_MASK64 = (1 << 64) - 1

_CYR_WORDS = (
    "договор счёт оплата уровень передача документ работа система "
    "значение пример раздел глава приложение таблица страница"
).split()

_EN_FILLER = "report annex figure chapter section summary appendix note".split()


class _Rng:
    """Tiny deterministic 64-bit LCG seeded from a string key."""

    def __init__(self, key: str) -> None:
        self.x = int.from_bytes(hashlib.sha1(key.encode()).digest()[:8], "big")

    def next(self, n: int) -> int:
        self.x = (self.x * 6364136223846793005 + 1442695040888963407) & _MASK64
        return (self.x >> 33) % n


# ---------------------------------------------------------------------------
# span payload builders
# ---------------------------------------------------------------------------

_TRIGGERS = ("hyphen", "nl", "nlrun", "nbsp", "tab", "ctrl", "crlf", "none", "none")


def _words(rng: _Rng, pool: list[str], n: int) -> list[str]:
    if not pool:
        # an empty/whitespace-only base text must not ZeroDivision the
        # whole corpus build; fall back to the filler vocabulary (the rng
        # draw sequence below is unchanged for non-empty pools)
        pool = _EN_FILLER
    start = rng.next(max(1, len(pool)))
    out = []
    for j in range(n):
        src = rng.next(10)
        if src < 6:
            out.append(pool[(start + j * 7) % len(pool)])
        elif src < 8:
            out.append(_CYR_WORDS[rng.next(len(_CYR_WORDS))])
        else:
            out.append(_EN_FILLER[rng.next(len(_EN_FILLER))])
    return out


def _noisy_text(rng: _Rng, pool: list[str], min_words: int = 5, max_words: int = 30) -> str:
    """Word salad with injected normalization triggers."""
    n = min_words + rng.next(max_words - min_words + 1)
    words = _words(rng, pool, n)
    pieces: list[str] = []
    for w in words:
        trig = _TRIGGERS[rng.next(len(_TRIGGERS))]
        if trig == "hyphen":
            cut = max(1, len(w) // 2)
            pieces.append(w[:cut] + "-\n" + w[cut:] + " ")
        elif trig == "nl":
            pieces.append(w + "\n")
        elif trig == "nlrun":
            pieces.append(w + "\n" * (3 + rng.next(3)))
        elif trig == "nbsp":
            pieces.append(w + "\u00a0")
        elif trig == "tab":
            pieces.append(w + "\t\t ")
        elif trig == "ctrl":
            pieces.append(w + chr(1 + rng.next(8)) + " ")
        elif trig == "crlf":
            pieces.append(w + "\r\n")
        else:
            pieces.append(w + " ")
    return "".join(pieces).rstrip()


def _html_payload(rng: _Rng, pool: list[str]) -> str:
    main = _noisy_text(rng, pool, 8, 25)
    aside = " ".join(_words(rng, pool, 4))
    nav_links = "".join(
        f'<a href="/p{rng.next(100)}">{w}</a> ' for w in _words(rng, pool, 5)
    )
    comment = " ".join(_words(rng, pool, 3))
    return (
        "<html><head><meta charset=\"utf-8\"><title>t</title>"
        "<script>var x = 1;</script><style>.m{color:red}</style></head>"
        f"<body><header>site head</header><nav>{nav_links}</nav>"
        f"<!-- {comment} -->"
        f"<div class=\"main\"><p>{main}</p></div>"
        f"<aside>{aside}</aside>"
        "<form><input value=\"q\"></form>"
        "<iframe src=\"/ad\"></iframe>"
        "<footer>copyright</footer></body></html>"
    )


def _pdf_payload(rng: _Rng, pool: list[str]) -> str:
    """One page: 2–5 layout-ordered blocks joined with blank lines.

    Blocks never contain "\\n\\n" internally (corpus invariant relied on by
    kernels.pdf_extract); ~1 in 6 pages is empty (scan-page analogue of
    ``_page_has_text`` false, pdf_fast.py:49-60).
    """
    if rng.next(6) == 0:
        return ""
    n_blocks = 2 + rng.next(4)
    blocks = []
    for _ in range(n_blocks):
        if rng.next(8) == 0:
            blocks.append("")  # empty block, dropped by the extractor
        else:
            line1 = " ".join(_words(rng, pool, 3 + rng.next(6)))
            line2 = " ".join(_words(rng, pool, 2 + rng.next(5)))
            blocks.append(line1 + "\n" + line2)
    return "\n\n".join(blocks)


def _msg_payload(rng: _Rng, pool: list[str]) -> str:
    """Synthetic Outlook .msg container (E16): real CFB bytes latin-1-mapped
    into the text column — the binary-kind convention the msg kernel
    expects. Exercises the pure-stdlib compound-file reader end-to-end."""
    from .kernels.cfb_build import build_msg

    subj = " ".join(_words(rng, pool, 2 + rng.next(4)))
    body = _noisy_text(rng, pool, 5, 20)
    raw = build_msg(
        subject=subj,
        sender=f"user{rng.next(100)}@corp.ru",
        to=f"user{rng.next(100)}@x.io",
        body=body,
        # deterministic delivery times inside the events window
        delivery_filetime=(13_340_000_000 + rng.next(2_500_000)) * 10_000_000,
        attachments=(f"doc{rng.next(50)}.pdf",) if rng.next(3) == 0 else (),
    )
    return raw.decode("latin-1")


def _rtf_payload(rng: _Rng, pool: list[str]) -> str:
    """RTF document (E13): header control words, a dropped ``\\*`` generator
    group and font/color destination tables, ``\\par``/``\\tab`` breaks, and
    Cyrillic words emitted as cp1251 ``\\'xx`` hex escapes or ``\\uN``
    unicode escapes — the full surface of kernels.rtf_extract."""
    words = _words(rng, pool, 6 + rng.next(18))
    body: list[str] = []
    for w in words:
        if any(ord(c) > 127 for c in w):
            if rng.next(2) == 0:
                body.append(
                    "".join(f"\\u{ord(c)}?" if ord(c) > 127 else c for c in w)
                )
            else:
                body.append("".join(f"\\'{b:02x}" for b in w.encode("cp1251")))
        else:
            body.append(w)
        sep = rng.next(6)
        if sep == 0:
            body.append("\\par ")
        elif sep == 1:
            body.append("\\tab ")
        else:
            body.append(" ")
    return (
        "{\\rtf1\\ansi\\deff0"
        "{\\fonttbl{\\f0 Times New Roman;}}"
        "{\\colortbl;\\red0\\green0\\blue0;}"
        "{\\*\\generator corpus}"
        "\\f0\\fs24 " + "".join(body) + "}"
    )


def _xls_payload(rng: _Rng, pool: list[str]) -> str:
    """Workbook payload (E14), two representations drawn 50/50:

    * the JSON span-data-model convention of kernels.xls_extract
      (``{"sheets": {name: [[cell, ...], ...]}}``), and
    * a REAL ``.xlsx`` ZIP container (kernels.xlsx_build, byte-
      deterministic) latin-1-mapped — the binary-kind convention — so
      the pure-stdlib OOXML reader runs under the hash-exact
      extract_spans golden.

    Cyrillic sheet names, mixed word/number cells either way.
    """
    import json

    as_binary = rng.next(2) == 0
    sheets: dict[str, list[list[Any]]] = {}
    for si in range(1 + rng.next(3)):
        n_rows, n_cols = 1 + rng.next(5), 1 + rng.next(4)
        rows = []
        for _ in range(n_rows):
            row: list[Any] = []
            for _ in range(n_cols):
                if rng.next(3) == 0:
                    row.append(rng.next(10_000))
                else:
                    row.append(_words(rng, pool, 1)[0])
            rows.append(row)
        sheets[f"Лист{si + 1}"] = rows
    if as_binary:
        from .kernels.xlsx_build import build_xlsx

        return build_xlsx(sheets).decode("latin-1")
    return json.dumps({"sheets": sheets}, ensure_ascii=False)


def _eml_payload(rng: _Rng, pool: list[str]) -> str:
    """Raw RFC-822 message (E15): RFC2047-encoded Cyrillic subject, 8-bit
    utf-8 body (text/plain, or text/html for ~1/3 of messages), and a
    base64 attachment part on ~1/3 — exercising the header template, the
    HTML-body fallback and the attachment enumeration of
    kernels.email_extract."""
    from email.header import Header

    subj = Header(" ".join(_words(rng, pool, 2 + rng.next(4))), "utf-8").encode()
    frm = f"user{rng.next(100)}@corp.ru"
    to = f"user{rng.next(100)}@x.io"
    cc = f"cc{rng.next(50)}@corp.ru" if rng.next(3) == 0 else ""
    date = (
        f"Mon, {1 + rng.next(28):02d} Apr 2025 "
        f"{rng.next(24):02d}:{rng.next(60):02d}:00 +0300"
    )
    body = _noisy_text(rng, pool, 5, 20)
    html_body = rng.next(3) == 0
    atts = [f"doc{rng.next(50)}.pdf"] if rng.next(3) == 0 else []

    head = [f"Subject: {subj}", f"From: {frm}", f"To: {to}"]
    if cc:
        head.append(f"Cc: {cc}")
    head.append(f"Date: {date}")
    head.append("MIME-Version: 1.0")

    if html_body:
        part_type = "text/html; charset=utf-8"
        part_body = f"<html><body><p>{body}</p><br><div>конец</div></body></html>"
    else:
        part_type = "text/plain; charset=utf-8"
        part_body = body

    if not atts:
        head.append(f"Content-Type: {part_type}")
        head.append("Content-Transfer-Encoding: 8bit")
        return "\n".join(head) + "\n\n" + part_body + "\n"

    b = "----=_corpus_boundary_42"
    head.append(f'Content-Type: multipart/mixed; boundary="{b}"')
    parts = [
        "\n".join(head),
        "",
        f"--{b}",
        f"Content-Type: {part_type}",
        "Content-Transfer-Encoding: 8bit",
        "",
        part_body,
    ]
    for name in atts:
        parts += [
            f"--{b}",
            f'Content-Type: application/pdf; name="{name}"',
            f'Content-Disposition: attachment; filename="{name}"',
            "Content-Transfer-Encoding: base64",
            "",
            "JVBERi0xLjQKJcOkw7zDtsOf",
        ]
    parts.append(f"--{b}--")
    return "\n".join(parts) + "\n"


# kind mix: txt 24 / html 23 / pdf 20 / docx 10 / image 10 / msg 2 /
# rtf 2 / xls 2 / email 2 / uns 5
_KIND_CUM = (
    ("txt", 24), ("html", 47), ("pdf", 67), ("docx", 77), ("image", 87),
    ("msg", 89), ("rtf", 91), ("xls", 93), ("email", 95), ("uns", 100),
)


def _pick_kind(rng: _Rng) -> str:
    r = rng.next(100)
    for kind, cum in _KIND_CUM:
        if r < cum:
            return kind
    return "uns"


def build_document(i: int, base_texts: list[str]) -> dict[str, Any]:
    """The single deterministic rule: doc index -> input-row dict."""
    doc_id = f"doc_{i:08d}"
    rng = _Rng(f"corpus:{i}")
    pool = base_texts[i % len(base_texts)].split()

    spans: list[dict[str, Any]] = []
    if rng.next(100) == 0:  # 1% giant-PDF skew tail: 64–256 page spans
        m = 64 + rng.next(193)
        for off in range(m):
            spans.append(
                {"kind": "pdf", "text": _pdf_payload(rng, pool), "media_ref": "", "offset": off}
            )
        return {"doc_id": doc_id, "spans": spans}

    m = 1 + rng.next(8)
    for off in range(m):
        kind = _pick_kind(rng)
        text, media_ref = "", ""
        if kind == "txt" or kind == "docx":
            text = _noisy_text(rng, pool)
        elif kind == "html":
            text = _html_payload(rng, pool)
        elif kind == "pdf":
            text = _pdf_payload(rng, pool)
        elif kind == "msg":
            text = _msg_payload(rng, pool)
        elif kind == "rtf":
            text = _rtf_payload(rng, pool)
        elif kind == "xls":
            text = _xls_payload(rng, pool)
        elif kind == "email":
            text = _eml_payload(rng, pool)
        elif kind == "image":
            media_ref = f"media://{doc_id}/{off}"
        else:  # uns: arbitrary junk payload
            text = "%PDF-garbage\x00\x01" + " ".join(_words(rng, pool, 3))
        spans.append({"kind": kind, "text": text, "media_ref": media_ref, "offset": off})
    return {"doc_id": doc_id, "spans": spans}


# ---------------------------------------------------------------------------
# materialization
# ---------------------------------------------------------------------------


def load_base_texts(sf_dir: str) -> list[str]:
    """Base vocabulary texts from the driver-provided documents table."""
    df = pd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return df.sort_values("doc_id")["text"].tolist()


def n_docs_for(sf_dir: str, default: int = 1_000) -> int:
    for sf, n in SF_DOCS.items():
        if sf_dir.rstrip("/").endswith(f"sf{sf}"):
            return n
    return default


def build_local(base_texts: list[str], n_docs: int) -> list[dict[str, Any]]:
    """In-memory corpus for pytest-scale runs."""
    return [build_document(i, base_texts) for i in range(n_docs)]


def corpus_df(spark, sf_dir: str, n_docs: int | None = None, partitions: int | None = None):
    """Distributed corpus build: spark.range → mapInPandas(build_document).

    The generator is embarrassingly parallel over doc indices; base texts
    ride along via closure capture (≈1.5 MB at sf0.1 — serialized once per
    task, broadcast-sized).
    """
    n = n_docs if n_docs is not None else n_docs_for(sf_dir)
    p = partitions or spark.sparkContext.defaultParallelism
    base = load_base_texts(sf_dir)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = [build_document(int(i), base) for i in b["id"]]
            yield pd.DataFrame(
                {
                    "doc_id": [r["doc_id"] for r in rows],
                    "spans": [r["spans"] for r in rows],
                }
            )

    return (
        spark.range(0, n, numPartitions=p)
        .mapInPandas(gen, schema=SPANS_IN_SCHEMA)
    )
