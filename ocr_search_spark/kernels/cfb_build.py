"""Minimal [MS-CFB] compound-file WRITER — fixture generation only.

The corpus generator (:mod:`ocr_search_spark.corpus`) uses this to
synthesize deterministic Outlook ``.msg`` containers for the interleaved
corpus, and the E16 kernel tests parse its output with
:mod:`.msg_extract`'s independent reader. Layout produced: 512-byte
sectors, a single FAT sector (plenty for fixture-sized files), top-level
streams plus optional storages with child streams; streams under the
4096-byte mini cutoff land in the root mini stream via the miniFAT,
larger ones in regular FAT chains.

Not a general-purpose writer: no DIFAT chains, no multi-sector FAT, no
red-black balancing (sibling chains are linear — valid per spec readers
that walk the tree, which ours and real parsers do).
"""

from __future__ import annotations

import struct

NOSTREAM = 0xFFFFFFFF
ENDOFCHAIN = 0xFFFFFFFE
FATSECT = 0xFFFFFFFD

_SS, _MS, _CUTOFF = 512, 64, 4096


def _dir_entry(name, etype, left=NOSTREAM, right=NOSTREAM, child=NOSTREAM,
               start=0, size=0) -> bytes:
    raw = bytearray(128)
    enc = name.encode("utf-16-le")
    raw[: len(enc)] = enc
    struct.pack_into("<H", raw, 64, len(enc) + 2)
    raw[66] = etype
    raw[67] = 1  # black
    struct.pack_into("<III", raw, 68, left, right, child)
    struct.pack_into("<I", raw, 116, start)
    struct.pack_into("<Q", raw, 120, size)
    return bytes(raw)


def build_cfb(top_streams: dict[str, bytes],
              storages: dict[str, dict[str, bytes]] | None = None) -> bytes:
    """Serialize a compound file with the given top-level streams and
    (storage → child streams) storages."""
    storages = storages or {}

    entries = [dict(name="Root Entry", etype=5, left=NOSTREAM, right=NOSTREAM,
                    child=NOSTREAM, start=0, size=0, payload=None)]

    def add_chain(members):
        idxs = [len(entries) + i for i in range(len(members))]
        for i, m in enumerate(members):
            m["right"] = idxs[i + 1] if i + 1 < len(idxs) else NOSTREAM
            entries.append(m)
        return idxs[0] if idxs else NOSTREAM

    tops = [dict(name=n, etype=2, left=NOSTREAM, right=NOSTREAM, child=NOSTREAM,
                 start=0, size=len(p), payload=p) for n, p in top_streams.items()]
    stor = [dict(name=n, etype=1, left=NOSTREAM, right=NOSTREAM, child=NOSTREAM,
                 start=0, size=0, payload=None, subs=subs)
            for n, subs in storages.items()]
    entries[0]["child"] = add_chain(tops + stor)
    for st in stor:
        subs = [dict(name=n, etype=2, left=NOSTREAM, right=NOSTREAM,
                     child=NOSTREAM, start=0, size=len(p), payload=p)
                for n, p in st["subs"].items()]
        st["child"] = add_chain(subs)

    # mini stream + miniFAT for small streams
    mini, minifat = bytearray(), []
    for e in entries:
        if e["payload"] is not None and e["size"] < _CUTOFF:
            n_ms = max(1, -(-e["size"] // _MS))
            e["start"] = len(minifat)
            minifat.extend(
                list(range(len(minifat) + 1, len(minifat) + n_ms)) + [ENDOFCHAIN]
            )
            mini.extend(e["payload"].ljust(n_ms * _MS, b"\0"))

    # regular sector layout: [FAT, dir..., miniFAT, mini..., large...]
    n_dir = max(1, -(-len(entries) // 4))
    n_minisec = -(-len(mini) // _SS)
    fat = [FATSECT]  # sector 0: the FAT itself
    nxt = 1

    def alloc(count):
        nonlocal nxt
        first = nxt
        for i in range(count):
            fat.append(nxt + 1 if i + 1 < count else ENDOFCHAIN)
            nxt += 1
        return first

    first_dir = alloc(n_dir)
    first_minifat = alloc(1) if minifat else ENDOFCHAIN
    first_mini = alloc(n_minisec) if n_minisec else 0
    for e in entries:
        if e["payload"] is not None and e["size"] >= _CUTOFF:
            e["start"] = alloc(-(-e["size"] // _SS))
    entries[0]["start"], entries[0]["size"] = first_mini, len(mini)

    dir_raw = b"".join(
        _dir_entry(e["name"], e["etype"], e["left"], e["right"], e["child"],
                   e["start"], e["size"])
        for e in entries
    ).ljust(n_dir * _SS, b"\0")
    minifat_raw = b"".join(struct.pack("<I", v) for v in minifat).ljust(_SS, b"\xff")
    large_raw = b"".join(
        e["payload"].ljust(-(-e["size"] // _SS) * _SS, b"\0")
        for e in entries
        if e["payload"] is not None and e["size"] >= _CUTOFF
    )
    body = (
        dir_raw
        + (minifat_raw if minifat else b"")
        + bytes(mini).ljust(n_minisec * _SS, b"\0")
        + large_raw
    )

    # Capacity guards: the writer assumes a single FAT sector (≤128 sector
    # entries ≈ 64 KB file), a single miniFAT sector (≤128 mini-sector
    # entries ≈ 8 KB of small-stream data) and one DIFAT header slot. An
    # oversized fixture must fail loudly here — exceeding either silently
    # shifts every subsequent sector and emits a corrupt container.
    if len(fat) > _SS // 4:
        raise ValueError(f"fixture too large: {len(fat)} FAT entries > {_SS // 4}")
    if len(minifat) > _SS // 4:
        raise ValueError(
            f"fixture too large: {len(minifat)} miniFAT entries > {_SS // 4}"
        )

    fat_raw = b"".join(struct.pack("<I", v) for v in fat).ljust(_SS, b"\xff")
    header = bytearray(512)
    header[:8] = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
    struct.pack_into("<H", header, 24, 0x3E)    # minor version
    struct.pack_into("<H", header, 26, 3)       # major v3
    struct.pack_into("<H", header, 28, 0xFFFE)  # little-endian
    struct.pack_into("<H", header, 30, 9)       # 512-byte sectors
    struct.pack_into("<H", header, 32, 6)       # 64-byte mini sectors
    struct.pack_into("<I", header, 44, 1)       # 1 FAT sector
    struct.pack_into("<I", header, 48, first_dir)
    struct.pack_into("<I", header, 56, _CUTOFF)
    struct.pack_into("<I", header, 60, first_minifat)
    struct.pack_into("<I", header, 64, 1 if minifat else 0)
    struct.pack_into("<I", header, 68, ENDOFCHAIN)  # no DIFAT chain
    struct.pack_into("<I", header, 72, 0)
    struct.pack_into("<I", header, 76, 0)       # DIFAT[0] = FAT sector 0
    for off in range(80, 512, 4):
        struct.pack_into("<I", header, off, NOSTREAM)
    return bytes(header) + fat_raw + body


def build_msg(subject: str = "", sender: str = "", to: str = "", cc: str = "",
              body: str = "", delivery_filetime: int | None = None,
              attachments: tuple[str, ...] = ()) -> bytes:
    """A minimal .msg container with the property streams the E16 kernel
    reads (UTF-16LE string properties + optional PT_SYSTIME delivery)."""
    u16 = lambda s: s.encode("utf-16-le")  # noqa: E731
    tops = {
        "__substg1.0_0037001F": u16(subject),
        "__substg1.0_0C1A001F": u16(sender),
        "__substg1.0_0E04001F": u16(to),
        "__substg1.0_0E03001F": u16(cc),
        "__substg1.0_1000001F": u16(body),
    }
    if delivery_filetime is not None:
        props = bytearray(32)
        props += struct.pack("<IIQ", 0x0E060040, 0, delivery_filetime)
        tops["__properties_version1.0"] = bytes(props)
    stor = {
        f"__attach_version1.0_#{i:08X}": {"__substg1.0_3707001F": u16(name)}
        for i, name in enumerate(attachments)
    }
    return build_cfb(tops, stor)
