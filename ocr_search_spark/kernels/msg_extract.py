"""Outlook .msg extraction (operator E16) — pure-stdlib CFB/OLE2 reader.

The reference parses .msg via the extract_msg / msg_parser packages
(reference: app/services/extractors/email.py:116-213) and renders the same
Russian header template as EML (Тема/От  /Кому/Копия/Дата + "Тело письма:"
+ enumerated "Вложения:", with a trailing ``.strip()`` — email.py:158-166).
Neither package (nor olefile) exists in this environment, so this module
implements the minimal subset of the public [MS-CFB] Compound File Binary
spec needed to pull the MAPI property streams out of the container:

* header → sector size, DIFAT → FAT (sector chains), directory chain;
* directory entries (128 bytes: UTF-16LE name, type, sibling/child tree,
  start sector, size);
* stream reads via the FAT, or via the miniFAT inside the root entry's
  mini stream for streams under the mini cutoff (4096 bytes);
* MAPI property substreams named ``__substg1.0_<PPPP><TTTT>`` where PPPP
  is the property id and TTTT the type (001F = UTF-16LE, 001E = 8-bit):
  0037 subject, 0C1A sender name, 5D01 sender SMTP, 0E04 display-to,
  0E03 display-cc, 1000 body ([MS-OXMSG] §2.1.3, [MS-OXPROPS]);
* PR_MESSAGE_DELIVERY_TIME (0E06, PT_SYSTIME) from the fixed-width
  ``__properties_version1.0`` records, FILETIME → UTC datetime;
* attachment storages ``__attach_version1.0_#NNNNNNNN`` → long/short
  filename substream (3707/3704).

Corrupt or non-CFB input returns "" like every other kernel (P5: extractors
never throw). A str input is treated as latin-1-mapped raw bytes (the
lossless bytes↔str convention the span text column uses for binary kinds).
"""

from __future__ import annotations

import struct
from datetime import datetime, timedelta, timezone

FREESECT = 0xFFFFFFFF
ENDOFCHAIN = 0xFFFFFFFE
NOSTREAM = 0xFFFFFFFF

_MAGIC = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"

#: 1601-01-01 epoch of FILETIME (100 ns ticks)
_FILETIME_EPOCH = datetime(1601, 1, 1, tzinfo=timezone.utc)

#: absolute backstop on chain walks (real bound is per-file: see read_chain)
_MAX_SECTORS = 1 << 20


class _Entry:
    __slots__ = ("name", "type", "left", "right", "child", "start", "size")

    def __init__(self, raw: bytes):
        name_len = struct.unpack_from("<H", raw, 64)[0]
        name_len = min(max(name_len - 2, 0), 64)
        self.name = raw[:name_len].decode("utf-16-le", errors="replace")
        self.type = raw[66]
        self.left, self.right, self.child = struct.unpack_from("<III", raw, 68)
        self.start = struct.unpack_from("<I", raw, 116)[0]
        self.size = struct.unpack_from("<Q", raw, 120)[0]


class _Cfb:
    """Minimal compound-file reader over an in-memory byte string."""

    def __init__(self, data: bytes):
        if len(data) < 512 or data[:8] != _MAGIC:
            raise ValueError("not a compound file")
        self.data = data
        sector_shift = struct.unpack_from("<H", data, 30)[0]
        mini_shift = struct.unpack_from("<H", data, 32)[0]
        if not (6 <= sector_shift <= 16) or not (2 <= mini_shift <= sector_shift):
            raise ValueError("implausible sector shift")
        self.ssz = 1 << sector_shift
        self.mssz = 1 << mini_shift
        n_fat = struct.unpack_from("<I", data, 44)[0]
        first_dir = struct.unpack_from("<I", data, 48)[0]
        self.mini_cutoff = struct.unpack_from("<I", data, 56)[0]
        first_minifat = struct.unpack_from("<I", data, 60)[0]
        n_minifat = struct.unpack_from("<I", data, 64)[0]
        first_difat = struct.unpack_from("<I", data, 68)[0]
        n_difat = struct.unpack_from("<I", data, 72)[0]

        # DIFAT: 109 header entries + optional DIFAT sector chain.
        # Bound the walk by the sectors that physically exist and a
        # visited set — a crafted header n_difat (up to 2^32) with a
        # self-looping DIFAT sector would otherwise grow the list for
        # hours on the never-throw extraction path (same OOM class the
        # FAT/miniFAT chain walks guard against).
        difat = list(struct.unpack_from("<109I", data, 76))
        sect = first_difat
        max_sectors = len(data) // max(self.ssz, 1) + 2
        seen_difat: set[int] = set()
        for _ in range(min(n_difat, max_sectors)):
            if sect in (FREESECT, ENDOFCHAIN) or sect in seen_difat:
                break
            seen_difat.add(sect)
            raw = self._sector(sect)
            ids = struct.unpack(f"<{self.ssz // 4}I", raw)
            difat.extend(ids[:-1])
            sect = ids[-1]
        fat_sectors = [s for s in difat[: max(n_fat, 0) or len(difat)] if s != FREESECT]

        fat = bytearray()
        for s in fat_sectors[:n_fat]:
            fat.extend(self._sector(s))
        self.fat = struct.unpack(f"<{len(fat) // 4}I", bytes(fat))

        dir_raw = self.read_chain(first_dir)
        self.entries = [
            _Entry(dir_raw[off : off + 128])
            for off in range(0, len(dir_raw) - 127, 128)
        ]
        if not self.entries or self.entries[0].type != 5:
            raise ValueError("missing root entry")
        root = self.entries[0]
        self._mini_data = self.read_chain(root.start, size=root.size)
        minifat_raw = self.read_chain(first_minifat) if n_minifat else b""
        self.minifat = struct.unpack(f"<{len(minifat_raw) // 4}I", minifat_raw)

    def _sector(self, n: int) -> bytes:
        off = (n + 1) * self.ssz
        return self.data[off : off + self.ssz]

    def read_chain(self, start: int, size: int | None = None) -> bytes:
        # Hop bound = sectors that physically fit in the file (+2 slack), so a
        # crafted FAT cycle over valid sectors can accumulate at most one file
        # length of data, never sector_size * 1M (executor-OOM class on the
        # never-throw extraction path). Also stop as soon as the declared
        # stream size is satisfied — a cycle past that point is unreachable.
        out, sect, hops = bytearray(), start, 0
        max_hops = min(len(self.data) // self.ssz + 2, _MAX_SECTORS)
        while sect not in (ENDOFCHAIN, FREESECT) and hops < max_hops:
            out.extend(self._sector(sect))
            if size is not None and len(out) >= size:
                break
            sect = self.fat[sect] if sect < len(self.fat) else ENDOFCHAIN
            hops += 1
        return bytes(out[:size]) if size is not None else bytes(out)

    def _read_mini_chain(self, start: int, size: int) -> bytes:
        # Same cycle guard: a mini chain cannot be longer than the miniFAT.
        out, sect, hops = bytearray(), start, 0
        max_hops = min(len(self.minifat) + 2, _MAX_SECTORS)
        while sect not in (ENDOFCHAIN, FREESECT) and hops < max_hops:
            off = sect * self.mssz
            out.extend(self._mini_data[off : off + self.mssz])
            if len(out) >= size:
                break
            sect = self.minifat[sect] if sect < len(self.minifat) else ENDOFCHAIN
            hops += 1
        return bytes(out[:size])

    def read_stream(self, e: _Entry) -> bytes:
        if e.size < self.mini_cutoff and e.type != 5:
            return self._read_mini_chain(e.start, e.size)
        return self.read_chain(e.start, size=e.size)

    def children(self, e: _Entry) -> list[_Entry]:
        """All direct children of a storage (flatten the sibling R-B tree)."""
        out, stack, seen = [], [e.child], set()
        while stack:
            i = stack.pop()
            if i == NOSTREAM or i >= len(self.entries) or i in seen:
                continue
            seen.add(i)
            node = self.entries[i]
            out.append(node)
            stack.extend((node.left, node.right))
        return out


def _prop_str(cfb: _Cfb, nodes: list[_Entry], prop: str) -> str:
    """A string MAPI property from its ``__substg1.0_`` stream (001F
    UTF-16LE preferred, 001E 8-bit fallback), '' when absent."""
    by_name = {n.name: n for n in nodes}
    uni = by_name.get(f"__substg1.0_{prop}001F")
    if uni is not None:
        return cfb.read_stream(uni).decode("utf-16-le", errors="replace")
    byte = by_name.get(f"__substg1.0_{prop}001E")
    if byte is not None:
        raw = cfb.read_stream(byte)
        try:
            return raw.decode("utf-8")
        except UnicodeDecodeError:
            return raw.decode("latin-1")
    return ""


def _delivery_time(cfb: _Cfb, nodes: list[_Entry]) -> str:
    """PR_MESSAGE_DELIVERY_TIME from the fixed-width properties stream."""
    props = next((n for n in nodes if n.name == "__properties_version1.0"), None)
    if props is None:
        return ""
    raw = cfb.read_stream(props)
    # top-level header is 32 bytes, then 16-byte (tag, flags, value) records
    for off in range(32, len(raw) - 15, 16):
        tag = struct.unpack_from("<I", raw, off)[0]
        if tag == 0x0E060040:  # (prop 0E06 << 16) | PT_SYSTIME
            ticks = struct.unpack_from("<Q", raw, off + 8)[0]
            try:
                dt = _FILETIME_EPOCH + timedelta(microseconds=ticks // 10)
            except OverflowError:
                return ""
            return str(dt)
    return ""


def _attachment_names(cfb: _Cfb, nodes: list[_Entry]) -> list[str]:
    names = []
    for n in nodes:
        if n.type == 1 and n.name.startswith("__attach_version1.0_"):
            sub = cfb.children(n)
            names.append(
                _prop_str(cfb, sub, "3707")  # long filename
                or _prop_str(cfb, sub, "3704")  # short filename
                or _prop_str(cfb, sub, "3001")  # display name
                or "attachment"
            )
    return names


def msg_to_text(raw: str | bytes) -> str:
    """Flatten one Outlook .msg container to the reference's text template
    (email.py:158-166 — identical header lines to EML, plus ``.strip()``)."""
    if not raw:
        return ""
    data = raw.encode("latin-1", errors="ignore") if isinstance(raw, str) else raw
    try:
        cfb = _Cfb(data)
        top = cfb.children(cfb.entries[0])
        subj = _prop_str(cfb, top, "0037")
        from_ = _prop_str(cfb, top, "0C1A") or _prop_str(cfb, top, "5D01")
        to = _prop_str(cfb, top, "0E04")
        cc = _prop_str(cfb, top, "0E03")
        date = _delivery_time(cfb, top)
        body = _prop_str(cfb, top, "1000")
        atts = _attachment_names(cfb, top)
    except Exception:
        return ""  # P5: corrupt container → empty, counted upstream

    lines = [
        f"Тема: {subj}",
        f"От  : {from_}",
        f"Кому: {to}",
        f"Копия: {cc}",
        f"Дата: {date}",
    ]
    if body:
        lines.append("Тело письма:\n" + body)
    if atts:
        lines.append(
            "Вложения:\n" + "\n".join(f"{i + 1}. {n}" for i, n in enumerate(atts))
        )
    return "\n".join(lines).strip()
