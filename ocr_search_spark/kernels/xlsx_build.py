"""Deterministic minimal .xlsx builder (corpus fixture generator).

Companion of :mod:`.xlsx_extract` the same way :mod:`.cfb_build` is the
companion of :mod:`.msg_extract`: the corpus generator uses it to plant
REAL binary workbooks in the xls span mix so the OOXML reader runs under
the hash-exact extract_spans golden, not just unit tests.

Byte-determinism matters (the distributed and local corpus builds must
produce identical spans), so every zip member carries a fixed DOS
timestamp and ZIP_STORED compression — no clock, no zlib level drift.
"""

from __future__ import annotations

import io
import zipfile
from typing import Sequence

_EPOCH = (1980, 1, 1, 0, 0, 0)


def _colref(i: int) -> str:
    out = ""
    i += 1
    while i:
        i, r = divmod(i - 1, 26)
        out = chr(65 + r) + out
    return out


def _esc(s: str) -> str:
    return (
        s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
        .replace('"', "&quot;")
    )


def build_xlsx(sheets: dict[str, Sequence[Sequence[object]]]) -> bytes:
    """sheets: {name: rows}; cells may be str, int, float, bool or None
    (None = sparse gap, skipped like an unwritten cell)."""
    strings: list[str] = []
    index: dict[str, int] = {}

    def sref(s: str) -> int:
        if s not in index:
            index[s] = len(strings)
            strings.append(s)
        return index[s]

    sheet_xml: dict[str, str] = {}
    for si, (name, rows) in enumerate(sheets.items(), start=1):
        body = []
        for ri, row in enumerate(rows, start=1):
            cells = []
            for ci, v in enumerate(row):
                if v is None:
                    continue
                ref = f"{_colref(ci)}{ri}"
                if isinstance(v, bool):
                    cells.append(f'<c r="{ref}" t="b"><v>{int(v)}</v></c>')
                elif isinstance(v, (int, float)):
                    cells.append(f'<c r="{ref}"><v>{v}</v></c>')
                else:
                    cells.append(
                        f'<c r="{ref}" t="s"><v>{sref(str(v))}</v></c>'
                    )
            body.append(f'<row r="{ri}">{"".join(cells)}</row>')
        sheet_xml[f"xl/worksheets/sheet{si}.xml"] = (
            '<worksheet xmlns="http://schemas.openxmlformats.org/'
            'spreadsheetml/2006/main"><sheetData>'
            + "".join(body)
            + "</sheetData></worksheet>"
        )

    wb_sheets = "".join(
        f'<sheet name="{_esc(n)}" sheetId="{i}" r:id="rId{i}"/>'
        for i, n in enumerate(sheets, start=1)
    )
    workbook = (
        '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/'
        '2006/main" xmlns:r="http://schemas.openxmlformats.org/'
        f'officeDocument/2006/relationships"><sheets>{wb_sheets}</sheets>'
        "</workbook>"
    )
    rels = (
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/'
        '2006/relationships">'
        + "".join(
            f'<Relationship Id="rId{i}" Type="http://schemas.'
            "openxmlformats.org/officeDocument/2006/relationships/"
            f'worksheet" Target="worksheets/sheet{i}.xml"/>'
            for i in range(1, len(sheets) + 1)
        )
        + "</Relationships>"
    )
    sst = (
        '<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/'
        f'main" count="{len(strings)}" uniqueCount="{len(strings)}">'
        + "".join(f"<si><t>{_esc(s)}</t></si>" for s in strings)
        + "</sst>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        for name, xml in (
            ("xl/workbook.xml", workbook),
            ("xl/_rels/workbook.xml.rels", rels),
            ("xl/sharedStrings.xml", sst),
            *sheet_xml.items(),
        ):
            info = zipfile.ZipInfo(name, date_time=_EPOCH)
            info.compress_type = zipfile.ZIP_STORED
            zf.writestr(info, xml)
    return buf.getvalue()
