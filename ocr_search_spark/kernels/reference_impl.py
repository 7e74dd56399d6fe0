"""Scalar golden-truth implementation of the extraction contract.

This module is the *oracle* for span-sequence equality: a deliberately
straight-line, one-document-at-a-time re-statement of the reference's
extraction semantics (dispatch bytes_xtractor.py:50-88 → per-kind extractor →
``_preprocess_text_layer`` normalization bytes_xtractor.py:23-39). The
vectorized Spark pipeline must produce byte-identical span sequences
``(kind, text, media_ref, order)`` per doc_id (BASELINE.json invariant).

Kept intentionally independent of the vectorized batch path where possible:
normalization here is the scalar ``preprocess_text_layer`` (the vectorized
path uses the pandas chain), so tests cross-check the two formulations.
"""

from __future__ import annotations

from typing import Any

from .email_extract import eml_or_msg_to_text
from .msg_extract import msg_to_text
from .html_extract import html_to_text
from .normalize import preprocess_text_layer
from .ocr_stub import ocr_stub_text
from .pdf_extract import extract_pdf_page_text
from .rtf_extract import rtf_to_text
from .xls_extract import xls_any_to_text


def extract_span_text(kind: str, text: str, media_ref: str) -> str:
    """Extract + normalize a single span, scalar path."""
    kind = kind or "uns"
    text = text or ""
    if kind in ("txt", "docx"):
        raw = text
    elif kind == "pdf":
        raw = extract_pdf_page_text(text)
    elif kind == "html":
        raw = html_to_text(text)
    elif kind == "image":
        raw = ocr_stub_text(media_ref or "")
    elif kind == "rtf":
        raw = rtf_to_text(text)
    elif kind == "xls":
        raw = xls_any_to_text(text)
    elif kind == "email":
        # the reference's combined extractor sniffs CFB containers
        # (a user may hand a .msg file the .eml route, email.py:45-50)
        raw = eml_or_msg_to_text(text)
    elif kind == "msg":
        raw = msg_to_text(text)
    else:  # uns + unknown kinds (bytes_xtractor.py:70)
        raw = ""
    return preprocess_text_layer(raw)


def extract_document_spans(spans: list[dict[str, Any]]) -> list[dict[str, Any]]:
    """Golden output span sequence for one document.

    Input spans are ordered by ``offset``; output spans get a dense
    ``order`` 0..m-1 (FIXTURES.md §3 — empty-text spans are still emitted so
    sequences stay alignable).
    """
    ordered = sorted(spans, key=lambda s: s["offset"])
    out = []
    for i, s in enumerate(ordered):
        kind = s.get("kind") or "uns"
        out.append(
            {
                "kind": kind,  # input kind preserved (FIXTURES.md §3)
                "text": extract_span_text(kind, s.get("text"), s.get("media_ref")),
                "media_ref": s.get("media_ref") or "",
                "order": i,
            }
        )
    return out
