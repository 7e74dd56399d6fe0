"""Text-layer normalization (operator E18).

Replicates ``_preprocess_text_layer`` of the reference bug-for-bug
(reference: app/services/bytes_xtractor.py:17-39):

1. CRLF / CR -> LF
2. de-hyphenate line breaks:  ``(\\w)-\\s*\\n(\\w)`` -> ``\\1\\2``
3. single ``\\n`` (not part of ``\\n\\n``) -> space
4. collapse runs of space / tab / NBSP -> single space
5. ``\\n{3,}`` -> ``\\n``  (note: runs of exactly 2 newlines survive)
6. strip control chars ``[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]`` and NUL
7. **no NFC normalization** — the reference's ``unicodedata`` import is
   missing, so its NFC step silently NameErrors and is skipped
   (bytes_xtractor.py:33-37); we match that observable behavior.
8. ``.strip()``

The regexes are Python ``re`` with default (unicode) semantics — ``\\w``
matches Cyrillic, exactly as in the reference.
"""

from __future__ import annotations

import re

import pandas as pd

_WS_RE = re.compile(r"[ \t ]+")
_HYPHEN_RE = re.compile(r"(\w)-\s*\n(\w)")
_SINGLE_NL_RE = re.compile(r"(?<!\n)\n(?!\n)")
_MULTI_NL_RE = re.compile(r"\n{3,}")
_CTRL_RE = re.compile(r"[\x00-\x08\x0B\x0C\x0E-\x1F]")


def preprocess_text_layer(text: str) -> str:
    """Scalar normalization, mirrors bytes_xtractor.py:23-39 step for step."""
    if not text:
        return ""
    text = text.replace("\r\n", "\n").replace("\r", "\n")
    text = _HYPHEN_RE.sub(r"\1\2", text)
    text = _SINGLE_NL_RE.sub(" ", text)
    text = _WS_RE.sub(" ", text)
    text = _MULTI_NL_RE.sub("\n", text)
    text = _CTRL_RE.sub("", text)
    text = text.replace("\x00", "")
    # NFC intentionally NOT applied (reference bug, see module docstring).
    return text.strip()


def normalize_series(s: pd.Series) -> pd.Series:
    """Vectorized normalization over a pandas Series of strings.

    Same transformation as :func:`preprocess_text_layer`, expressed as a
    pandas ``.str`` chain so a whole Arrow batch is processed at once.
    """
    s = s.fillna("").astype(object).astype("string")

    # Each pass is applied only to rows containing its trigger characters —
    # pandas .str.replace is a per-element Python re.sub, so skipping the
    # (common) trigger-free rows cuts most of the regex cost. Masks are
    # exact: a rule can only change a string containing its trigger, so the
    # result is identical to the unmasked chain (the hypothesis parity test
    # vs the scalar path enforces this).
    def masked(series, mask, fn):
        if mask.any():
            series = series.copy()
            series[mask] = fn(series[mask])
        return series

    has_cr = s.str.contains("\r", regex=False)
    s = masked(
        s,
        has_cr,
        lambda x: x.str.replace("\r\n", "\n", regex=False).str.replace(
            "\r", "\n", regex=False
        ),
    )
    has_nl = s.str.contains("\n", regex=False)
    s = masked(s, has_nl, lambda x: x.str.replace(_HYPHEN_RE, r"\1\2", regex=True))
    has_nl = s.str.contains("\n", regex=False)  # hyphen rule consumes newlines
    s = masked(s, has_nl, lambda x: x.str.replace(_SINGLE_NL_RE, " ", regex=True))
    s = masked(
        s,
        s.str.contains("[\t\u00a0]|  ", regex=True),
        lambda x: x.str.replace(_WS_RE, " ", regex=True),
    )
    s = masked(
        s,
        s.str.contains("\n\n\n", regex=False),
        lambda x: x.str.replace(_MULTI_NL_RE, "\n", regex=True),
    )
    has_ctrl = s.str.contains(_CTRL_RE, regex=True)
    s = masked(
        s,
        has_ctrl,
        lambda x: x.str.replace(_CTRL_RE, "", regex=True).str.replace(
            "\x00", "", regex=False
        ),
    )
    return s.str.strip().astype(object)
