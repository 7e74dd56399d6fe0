"""Real .xlsx workbook flattening (operator E14, binary path).

The reference reads workbooks with ``pd.read_excel(sheet_name=None,
header=None)`` (openpyxl under the hood) and emits per sheet
``=== Лист: {name} ===`` + tab-separated rows (xls.py:15-34). openpyxl
is absent in this environment, so this is a from-scratch pure-stdlib
OOXML reader — ``zipfile`` + ``xml.etree`` — the same discipline as the
CFB reader in :mod:`.msg_extract`:

* sheet names and order from ``xl/workbook.xml``, resolved to their
  worksheet parts through ``xl/_rels/workbook.xml.rels``;
* shared strings (``t="s"``), inline strings (``t="inlineStr"``),
  formula-cached strings (``t="str"``), booleans and raw numbers;
* sparse rows/cells padded with "" to a dense grid (pandas renders the
  NaN gaps as empty fields in ``to_csv``).

Numbers are rendered as their XML literal (``3655``, ``1.5``) — the
closest deterministic analogue of pandas' mixed-dtype ``to_csv`` output.
The JSON-workbook span convention (:mod:`.xls_extract`) remains the
oracle-checked path; binary workbooks enter through the folder-scan
source, which preserves their bytes latin-1-mapped past the decode
cascade (see sources.py) so the ZIP magic survives.
"""

from __future__ import annotations

import io
import re
import zipfile
from xml.etree import ElementTree as ET

XLSX_MAGIC = b"PK\x03\x04"
XLSX_MAGIC_STR = XLSX_MAGIC.decode("latin-1")

_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_NS_R = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"
_NS_PKG = "{http://schemas.openxmlformats.org/package/2006/relationships}"

_COL = re.compile(r"([A-Z]+)")


def is_xlsx(raw: str | bytes) -> bool:
    if isinstance(raw, bytes):
        return raw.startswith(XLSX_MAGIC)
    return isinstance(raw, str) and raw.startswith(XLSX_MAGIC_STR)


def _col_index(ref: str) -> int | None:
    """'C7' -> 2; None when the cell has no reference attribute."""
    m = _COL.match(ref or "")
    if not m:
        return None
    n = 0
    for ch in m.group(1):
        n = n * 26 + (ord(ch) - 64)
    return n - 1


def _shared_strings(zf: zipfile.ZipFile) -> list[str]:
    try:
        data = zf.read("xl/sharedStrings.xml")
    except KeyError:
        return []
    out = []
    for si in ET.fromstring(data).iter(f"{_NS}si"):
        # plain <t> or rich-text runs <r><t>; itertext over the si node
        # concatenates both shapes
        out.append("".join(t.text or "" for t in si.iter(f"{_NS}t")))
    return out


def _sheet_cell(c, shared: list[str]) -> str:
    t = c.get("t", "n")
    if t == "inlineStr":
        is_node = c.find(f"{_NS}is")
        if is_node is None:
            return ""
        return "".join(tt.text or "" for tt in is_node.iter(f"{_NS}t"))
    v = c.find(f"{_NS}v")
    if v is None or v.text is None:
        return ""
    if t == "s":
        try:
            return shared[int(v.text)]
        except (ValueError, IndexError):
            return ""
    if t == "b":
        return "True" if v.text.strip() == "1" else "False"
    return v.text


def _sheet_rows(zf: zipfile.ZipFile, part: str, shared: list[str]) -> list[list[str]]:
    try:
        data = zf.read(part)
    except KeyError:
        return []
    rows: list[list[str]] = []
    n_cols = 0
    for row in ET.fromstring(data).iter(f"{_NS}row"):
        cells: list[str] = []
        for c in row.iter(f"{_NS}c"):
            idx = _col_index(c.get("r", ""))
            if idx is None:
                idx = len(cells)
            while len(cells) < idx:
                cells.append("")
            cells.append(_sheet_cell(c, shared))
        rows.append(cells)
        n_cols = max(n_cols, len(cells))
    # dense grid: pandas pads ragged rows with NaN -> "" in to_csv
    return [r + [""] * (n_cols - len(r)) for r in rows]


def xlsx_to_text(raw: str | bytes) -> str:
    """Flatten a real .xlsx to the reference's sheet template; corrupt or
    non-zip input returns "" (P5: extractors never throw)."""
    if not raw:
        return ""
    data = raw.encode("latin-1", errors="ignore") if isinstance(raw, str) else raw
    try:
        zf = zipfile.ZipFile(io.BytesIO(data))
        wb = ET.fromstring(zf.read("xl/workbook.xml"))
        rels = {
            rel.get("Id"): rel.get("Target")
            for rel in ET.fromstring(
                zf.read("xl/_rels/workbook.xml.rels")
            ).iter(f"{_NS_PKG}Relationship")
        }
        parts: list[tuple[str, str]] = []  # (sheet name, zip part)
        for sh in wb.iter(f"{_NS}sheet"):
            target = rels.get(sh.get(f"{_NS_R}id"), "")
            if not target:
                continue
            if target.startswith("/"):
                part = target.lstrip("/")
            else:
                part = "xl/" + target
            parts.append((sh.get("name") or "", part))
        shared = _shared_strings(zf)
        out = []
        for name, part in parts:
            tsv = "".join(
                "\t".join(r) + "\n" for r in _sheet_rows(zf, part, shared)
            )
            out.append(f"=== Лист: {name} ===")
            out.append(tsv)
        return "\n\n".join(out).strip()
    except Exception:
        return ""
