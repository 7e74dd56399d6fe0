"""Deterministic WARC/1.0 fixture writer (tests + oracle round-trips).

Same discipline as ``cfb_build``/``xlsx_build``: a from-scratch,
pure-stdlib writer for the PUBLIC format (ISO 28500 WARC/1.0) so the
reader (``kernels.warc``) can be exercised on real container bytes
without any external tooling, and so driver oracles can plant corpora
whose expected parse is arithmetically known.

Only what crawls actually emit is modeled: ``warcinfo``, ``request`` and
``response`` records; response payloads carry an HTTP/1.1 header block.
Records are CRLF-framed with exact ``Content-Length`` and the mandatory
two trailing CRLFs; ``gzip=True`` emits one gzip MEMBER per record and
concatenates them — the standard ``.warc.gz`` layout.
"""

from __future__ import annotations

import gzip as _gzip
import io


def build_http_response(
    body: bytes,
    content_type: str = "text/html; charset=utf-8",
    status: int = 200,
) -> bytes:
    """HTTP/1.1 response block (headers + body) for a response record."""
    head = (
        f"HTTP/1.1 {status} OK\r\n"
        f"Content-Type: {content_type}\r\n"
        f"Content-Length: {len(body)}\r\n\r\n"
    ).encode("ascii")
    return head + body


def build_warc_record(
    warc_type: str,
    payload: bytes,
    target_uri: str | None = None,
    date: str = "2024-01-01T00:00:00Z",
    record_id: str = "<urn:uuid:00000000-0000-0000-0000-000000000000>",
    content_type: str = "application/http; msgtype=response",
) -> bytes:
    headers = [
        ("WARC-Type", warc_type),
        ("WARC-Date", date),
        ("WARC-Record-ID", record_id),
        ("Content-Length", str(len(payload))),
        ("Content-Type", content_type),
    ]
    if target_uri is not None:
        headers.insert(3, ("WARC-Target-URI", target_uri))
    head = "WARC/1.0\r\n" + "".join(
        f"{k}: {v}\r\n" for k, v in headers
    )
    return head.encode("ascii") + b"\r\n" + payload + b"\r\n\r\n"


def build_warc(
    records: list[tuple[str, bytes, str | None]],
    gzip: bool = False,
) -> bytes:
    """Concatenate (warc_type, payload, target_uri) records into one WARC
    file; ``gzip=True`` wraps each record in its own gzip member
    (``.warc.gz`` layout — readers must decompress ALL members)."""
    out = io.BytesIO()
    for i, (wt, payload, uri) in enumerate(records):
        rec = build_warc_record(
            wt,
            payload,
            target_uri=uri,
            record_id=f"<urn:uuid:00000000-0000-0000-0000-{i:012d}>",
            content_type=(
                "application/warc-fields"
                if wt == "warcinfo"
                else "application/http; msgtype=response"
            ),
        )
        if gzip:
            buf = io.BytesIO()
            with _gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as g:
                g.write(rec)
            out.write(buf.getvalue())
        else:
            out.write(rec)
    return out.getvalue()
