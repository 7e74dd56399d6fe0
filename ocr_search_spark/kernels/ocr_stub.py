"""Deterministic OCR stub (operators E6/E7/E10).

Real Tesseract OCR (reference: app/services/extractors/pdf.py:203-222 for
images; pdf_fast.py:188-201 for scan pages) is non-deterministic and absent
in this environment. Per the north_star, image spans are routed "to OCR
stubs via media_ref": the stub derives a stable pseudo-OCR text from a
SHA-1 of the ``media_ref``, reproducing the smoke-test idea of a known
string recoverable from an image (app/tests/ocr_smoke.py:29-36).

Contract (FIXTURES.md §2): ``text = "OCR " + stable_words(media_ref, k)``
with ``k ∈ [3, 40]`` words drawn from a fixed wordlist (Latin + Cyrillic —
the reference OCRs with ``lang="rus+eng"``, extractors/base.py:24).
"""

from __future__ import annotations

import hashlib

# Fixed 64-entry wordlist; Cyrillic entries mirror the reference's RU focus.
WORDLIST = (
    "договор акт счет оплата заказ поставка услуга товар документ подпись "
    "дата сумма итого налог скидка номер адрес город страна компания "
    "invoice contract total amount date signature order supply service item "
    "page scan copy original draft final report table figure annex "
    "один два три четыре пять шесть семь восемь девять десять "
    "alpha beta gamma delta epsilon zeta eta theta iota kappa "
    "north south east west "
).split()
assert len(WORDLIST) == 64

_MASK64 = (1 << 64) - 1


def ocr_stub_text(media_ref: str) -> str:
    """Deterministic pseudo-OCR output for one media reference."""
    if not media_ref:
        return ""
    seed = int.from_bytes(
        hashlib.sha1(media_ref.encode("utf-8")).digest()[:8], "big"
    )
    k = 3 + seed % 38  # k in [3, 40]
    x = seed
    words = []
    for _ in range(k):
        # 64-bit LCG (Knuth's MMIX constants) over the sha1 seed.
        x = (x * 6364136223846793005 + 1442695040888963407) & _MASK64
        words.append(WORDLIST[(x >> 33) % len(WORDLIST)])
    return "OCR " + " ".join(words)
