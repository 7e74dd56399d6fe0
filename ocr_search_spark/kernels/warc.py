"""Pure-stdlib WARC/1.0 reader (ISO 28500) — the web-crawl source format.

From-scratch scanner over raw container bytes, the ``msg_extract`` /
``xlsx_extract`` discipline: no external WARC library, bounded loops,
fail-soft per record (a malformed record ends the scan of THAT file and
returns what parsed so far — kernels never throw, the P5 contract).

Handles the two layouts crawls ship:

* plain ``.warc``: CRLF-framed records concatenated;
* ``.warc.gz``: one gzip member per record — detected by magic and
  decompressed member-by-member (``zlib`` with ``wbits=31`` leaves the
  unused tail, so each member's end is known exactly).

``response`` payloads carrying an ``application/http`` block are split
into HTTP status / headers / body; the body is what downstream
extraction kernels consume. The body is returned as archived —
``Transfer-Encoding: chunked`` / ``Content-Encoding: gzip`` bodies are
NOT decoded here (most archivers store the decoded form; when yours
does not, de-chunk/inflate downstream where the HTTP headers are in
hand).
"""

from __future__ import annotations

import zlib

#: scan bounds — a container yielding more is pathological input
MAX_RECORDS = 100_000
MAX_HEADER_BYTES = 64 * 1024
#: per-gzip-member expansion cap (gzip-bomb guard): a crawled container
#: is attacker-supplied bytes; an unbounded decompress of a 42-byte bomb
#: would exhaust executor memory. Real WARC members are ≤ a few MB.
MAX_MEMBER_BYTES = 256 * 1024 * 1024


def _parse_headers(block: bytes) -> dict[str, str]:
    headers: dict[str, str] = {}
    for line in block.split(b"\r\n"):
        if b":" not in line:
            continue
        k, _, v = line.partition(b":")
        headers[k.strip().decode("latin-1").lower()] = v.strip().decode(
            "latin-1"
        )
    return headers


def _split_http(payload: bytes) -> tuple[int | None, str | None, bytes]:
    """(status, content_type, body) of an HTTP message payload; returns
    (None, None, payload) when it is not an HTTP block."""
    if not payload.startswith(b"HTTP/"):
        return None, None, payload
    sep = payload.find(b"\r\n\r\n")
    if sep < 0:
        return None, None, payload
    head, body = payload[:sep], payload[sep + 4 :]
    first, _, rest = head.partition(b"\r\n")
    parts = first.split(b" ")
    try:
        status = int(parts[1])
    except (IndexError, ValueError):
        status = None
    ctype = _parse_headers(rest).get("content-type")
    return status, ctype, body


def _gunzip_members(data: bytes):
    """Yield decompressed gzip members of a multi-member stream; stops at
    the first undecodable member (fail-soft)."""
    pos = 0
    for _ in range(MAX_RECORDS):
        if pos >= len(data):
            return
        d = zlib.decompressobj(31)
        try:
            chunk = d.decompress(data[pos:], MAX_MEMBER_BYTES)
        except zlib.error:
            return
        if d.unconsumed_tail:
            return  # member expands past the bomb cap — fail soft
        if not d.eof:
            return  # truncated member
        yield chunk
        consumed = len(data) - pos - len(d.unused_data)
        if consumed <= 0:
            return
        pos += consumed


def parse_warc(data: bytes) -> list[dict]:
    """All records of a WARC container (plain or per-record-gzip).

    Each record dict: ``warc_type``, ``target_uri``, ``date``,
    ``record_id``, ``payload`` (raw record block), and for HTTP
    payloads ``http_status``, ``http_content_type``, ``body`` (``body``
    == ``payload`` for non-HTTP records). Malformed framing ends the
    scan and returns what parsed (never raises).
    """
    if data[:2] == b"\x1f\x8b":
        chunks = _gunzip_members(data)
    else:
        chunks = [data]
    out: list[dict] = []
    for chunk in chunks:
        pos = 0
        for _ in range(MAX_RECORDS):
            # tolerate inter-record padding CRLFs
            while chunk[pos : pos + 2] == b"\r\n":
                pos += 2
            if pos >= len(chunk):
                break
            if not chunk.startswith(b"WARC/", pos):
                break  # framing lost — fail soft
            hdr_end = chunk.find(b"\r\n\r\n", pos, pos + MAX_HEADER_BYTES)
            if hdr_end < 0:
                break
            headers = _parse_headers(chunk[pos:hdr_end])
            try:
                length = int(headers.get("content-length", ""))
            except ValueError:
                break
            if length < 0 or hdr_end + 4 + length > len(chunk):
                break  # truncated payload
            payload = chunk[hdr_end + 4 : hdr_end + 4 + length]
            status, ctype, body = _split_http(payload)
            out.append(
                {
                    "warc_type": headers.get("warc-type", ""),
                    "target_uri": headers.get("warc-target-uri"),
                    "date": headers.get("warc-date"),
                    "record_id": headers.get("warc-record-id"),
                    "payload": payload,
                    "http_status": status,
                    "http_content_type": ctype,
                    "body": body,
                }
            )
            pos = hdr_end + 4 + length
            if len(out) >= MAX_RECORDS:
                break
    return out
