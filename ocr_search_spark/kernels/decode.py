"""Byte-decoding cascades (operators E3/E12).

The reference decodes raw bytes by trying encodings in a fixed order and
falling back to ``utf-8`` with ``errors="ignore"``:

* plain text (reference: app/services/extractors/txt.py:20-25):
  utf-8 → cp1251 → koi8-r → utf-16 → iso-8859-5 → mac-cyrillic
* HTML (app/services/extractors/html.py:98-105) appends latin-1 before the
  ignore fallback.

In the span data model payloads arrive as parquet strings (already decoded),
so these kernels serve the raw-bytes ingestion path (binaryFile source /
multimodal binary columns) and their unit tests.
"""

from __future__ import annotations

TXT_ENCODINGS = ("utf-8", "cp1251", "koi8-r", "utf-16", "iso-8859-5", "mac-cyrillic")
HTML_ENCODINGS = TXT_ENCODINGS + ("latin-1",)


def decode_bytes(content: bytes, encodings: tuple[str, ...] = TXT_ENCODINGS) -> str:
    """Decode ``content`` via the reference's encoding cascade."""
    if not content:
        return ""
    for enc in encodings:
        try:
            return content.decode(enc)
        except UnicodeDecodeError:
            continue
    return content.decode("utf-8", errors="ignore")
