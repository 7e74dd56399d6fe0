"""Excel workbook flattening (operator E14).

Replicates ``ExcelExtractor`` (reference: app/services/extractors/
xls.py:15-34): every sheet becomes a header line ``=== Лист: {name} ===``
followed by the cells as tab-separated rows; sheets joined with a blank
line.

Binary .xlsx parsing is unavailable here (no openpyxl), so in the span data
model an ``xls`` span carries the workbook as JSON
``{"sheets": {name: [[cell, ...], ...]}}``; the kernel re-creates the exact
template the reference produces from ``pd.read_excel(sheet_name=None,
header=None)`` + ``to_csv(sep="\\t")``.
"""

from __future__ import annotations

import json


def xls_any_to_text(payload: str | bytes) -> str:
    """Combined xls-kind entry: real .xlsx (ZIP magic) through the
    stdlib OOXML reader (:mod:`.xlsx_extract`); legacy BIFF .xls (CFB
    magic) is unsupported without xlrd → "" (P5 semantics, counted
    upstream); everything else is the JSON workbook span convention."""
    from .email_extract import is_msg as _is_cfb
    from .xlsx_extract import is_xlsx, xlsx_to_text

    if not payload:
        return ""
    if is_xlsx(payload):
        return xlsx_to_text(payload)
    if _is_cfb(payload):  # CFB magic = legacy BIFF container
        return ""
    if isinstance(payload, bytes):
        try:
            payload = payload.decode("utf-8")
        except UnicodeDecodeError:
            return ""
    return xls_to_text(payload)


def xls_to_text(payload: str) -> str:
    if not payload:
        return ""
    try:
        workbook = json.loads(payload)
        sheets = workbook["sheets"]
    except (ValueError, KeyError, TypeError):
        return ""
    # faithful template (xls.py:29-34): header and TSV are separate parts
    # joined by "\n\n"; to_csv(sep="\t") leaves a trailing newline; final
    # .strip()
    parts = []
    for name, rows in sheets.items():
        tsv = "".join("\t".join(str(c) for c in row) + "\n" for row in rows)
        parts.append(f"=== Лист: {name} ===")
        parts.append(tsv)
    return "\n\n".join(parts).strip()
