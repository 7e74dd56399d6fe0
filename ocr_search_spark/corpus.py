"""Deterministic interleaved text+media corpus (BASELINE.json input_hint).

Builds the pipeline's input table::

    documents(doc_id string,
              spans array<struct<kind:string, text:string,
                                 media_ref:string, offset:int>>)

Documents are derived *deterministically* (SHA-1-seeded LCG — no global RNG
state) from the driver-provided base texts in
``/root/testdata/sf*/documents.parquet``, following the FIXTURES.md §4
recipe: mixed-kind spans (txt 28 / html 25 / pdf 20 / docx 10 / image 10 /
msg 2 / uns 5 — msg spans are real CFB containers built by
kernels.cfb_build, latin-1-mapped), a 1% long tail of 64–256-page PDF
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


# kind mix: txt 28 / html 25 / pdf 20 / docx 10 / image 10 / msg 2 / uns 5
_KIND_CUM = (
    ("txt", 28), ("html", 53), ("pdf", 73), ("docx", 83), ("image", 93),
    ("msg", 95), ("uns", 100),
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
