"""Metadata extraction (S10): deterministic exiftool-analogue stub.

The reference shells out to ExifTool per uploaded file and stores the
tag→value dict as ``documents.meta`` JSON (app/services/metadata.py:8-37,
models.py:14). ExifTool itself is a process-boundary black box (and is not
present in this environment), so the graft mirrors the *data contract*: a
``meta map<string,string>`` column of stable tags derived purely from the
row — computable as Catalyst column expressions (no UDF, engine-portable,
oracle-checkable) and queryable with ``element_at(meta, 'Tag')`` exactly
like ``meta->>'Tag'`` on the reference's JSON column.

Tags emitted (ExifTool group-0 style names):

* ``FileName``   — ``{source}/{doc_id}{ext}`` (upload path analogue),
* ``FileType``   — upper-cased extension (ExifTool's File:FileType),
* ``MIMEType``   — mapped from the extension,
* ``FileSize``   — character count of the text payload (stringified),
* ``Language``   — pass-through of a language column when present,
* ``Checksum``   — md5 of the text payload.

The extension is a deterministic md5-hash pick over doc_id (the synthetic
corpus has no real files); a real deployment swaps ``ext_expr`` for the
upload filename's suffix and keeps everything downstream unchanged.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: extension universe + MIME mapping (reference handles these kinds,
#: bytes_xtractor.py dispatch table)
EXT_MIME = {
    "pdf": "application/pdf",
    "html": "text/html",
    "txt": "text/plain",
    "docx": "application/vnd.openxmlformats-officedocument.wordprocessingml.document",
}
_EXTS = sorted(EXT_MIME)  # deterministic order: docx, html, pdf, txt


def ext_expr(id_col: Column | str) -> Column:
    """Deterministic extension pick: md5-hash of the id over _EXTS.

    Engine-portable: ``conv(substring(md5('ext:'||id), 1, 8), 16, 10) %
    len`` in Spark ≡ ``('0x'||substring(md5(...),1,8))::BIGINT % len`` in
    DuckDB (same trick as ops.sampling)."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    h = F.conv(
        F.substring(F.md5(F.encode(F.concat(F.lit("ext:"), c.cast("string")), "utf-8")), 1, 8),
        16,
        10,
    ).cast("long")
    ext = F.lit(_EXTS[0])
    for i, e in enumerate(_EXTS[1:], start=1):
        ext = F.when(F.pmod(h, F.lit(len(_EXTS))) == i, F.lit(e)).otherwise(ext)
    return ext


def mime_expr(ext: Column) -> Column:
    out = F.lit("application/octet-stream")
    for e, m in EXT_MIME.items():
        out = F.when(ext == e, F.lit(m)).otherwise(out)
    return out


def metadata_map_expr(
    id_col: Column | str,
    text_col: Column | str,
    source_col: Column | str | None = None,
    lang_col: Column | str | None = None,
    ext: Column | None = None,
) -> Column:
    """The ``meta map<string,string>`` column (exiftool dict analogue)."""
    cid = F.col(id_col) if isinstance(id_col, str) else id_col
    ct = F.col(text_col) if isinstance(text_col, str) else text_col
    if ext is None:
        ext = ext_expr(cid)
    prefix = (
        (F.col(source_col) if isinstance(source_col, str) else source_col)
        if source_col is not None
        else F.lit("uploads")
    )
    filename = F.concat(prefix, F.lit("/"), cid.cast("string"), F.lit("."), ext)
    pairs = [
        (F.lit("FileName"), filename),
        (F.lit("FileType"), F.upper(ext)),
        (F.lit("MIMEType"), mime_expr(ext)),
        (F.lit("FileSize"), F.length(ct).cast("string")),
        (F.lit("Checksum"), F.md5(F.encode(ct, "utf-8"))),
    ]
    if lang_col is not None:
        lc = F.col(lang_col) if isinstance(lang_col, str) else lang_col
        pairs.append((F.lit("Language"), lc))
    return F.create_map(*[c for kv in pairs for c in kv])


def with_metadata(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str | None = None,
    lang_col: str | None = None,
    out_col: str = "meta",
) -> DataFrame:
    """Append the metadata map column (auto-detecting source/lang columns)."""
    cols = df.columns
    src = source_col if source_col is not None else ("source" if "source" in cols else None)
    lang = lang_col if lang_col is not None else ("lang" if "lang" in cols else None)
    return df.withColumn(
        out_col, metadata_map_expr(id_col, text_col, src, lang)
    )


# ---------------------------------------------------------------------------
# S10 media-span tag contract (EXIF/IPTC namespace)
# ---------------------------------------------------------------------------

#: fixture vocabularies for the media tag contract — the OCR-stub pattern
#: (kernels/ocr_stub.py): values derive deterministically from
#: md5(media_ref) alone, standing in for the exiftool process boundary
#: (reference app/services/metadata.py:8-37 shells out per file; its tag
#: namespace — EXIF:*, IPTC:* group-prefixed keys — is the contract).
EXIF_MAKES = ("Canon", "Nikon", "Sony", "Fujifilm", "Olympus")
IPTC_KEYWORDS = ("report", "scan", "invoice", "contract", "archive", "photo")


def _md5_slice_long(ref: Column, start: int) -> Column:
    """8-hex-digit slice of md5(ref) as a long — engine-portable
    (DuckDB: ('0x' || substring(md5(ref), start, 8))::BIGINT)."""
    return F.conv(
        F.substring(F.md5(F.encode(ref, "utf-8")), start, 8), 16, 10
    ).cast("long")


def _pick(h: Column, vocab: tuple[str, ...]) -> Column:
    out = F.lit(vocab[0])
    for i, v in enumerate(vocab[1:], start=1):
        out = F.when(F.pmod(h, F.lit(len(vocab))) == i, F.lit(v)).otherwise(out)
    return out


def exif_tags_expr(ref_col: Column | str) -> Column:
    """The deterministic ``media_ref -> EXIF/IPTC tags`` map for media
    spans — S10's media half, resolved as a fixture contract (VERDICT r4
    next-round #4). Four independent md5 slices drive the fields so tags
    don't correlate; every expression is a Catalyst builtin with an exact
    DuckDB twin (oracle: the ``meta_tags`` query).

    Tags: EXIF:Make, EXIF:Model, EXIF:ImageWidth, EXIF:ImageHeight,
    EXIF:Orientation, EXIF:DateTimeOriginal (exiftool's ``YYYY:MM:DD
    HH:MM:SS`` colon-date format), IPTC:Keywords.
    """
    ref = F.col(ref_col) if isinstance(ref_col, str) else ref_col
    h1 = _md5_slice_long(ref, 1)
    h2 = _md5_slice_long(ref, 9)
    h3 = _md5_slice_long(ref, 17)
    h4 = _md5_slice_long(ref, 25)
    make = _pick(h1, EXIF_MAKES)
    model = F.concat(
        make, F.lit(" X"), (F.pmod(h2, F.lit(900)) + F.lit(100)).cast("string")
    )
    width = (F.lit(640) + F.pmod(h2, F.lit(8)) * F.lit(160)).cast("long")
    height = (F.lit(480) + F.pmod(h3, F.lit(8)) * F.lit(120)).cast("long")
    orientation = (F.pmod(h3, F.lit(8)) + F.lit(1)).cast("long")
    dto = F.format_string(
        "2023:%02d:%02d %02d:%02d:%02d",
        F.pmod(h4, F.lit(12)) + F.lit(1),
        F.pmod(F.floor(h4 / F.lit(12)), F.lit(28)) + F.lit(1),
        F.pmod(F.floor(h4 / F.lit(336)), F.lit(24)),
        F.pmod(F.floor(h4 / F.lit(8064)), F.lit(60)),
        F.pmod(F.floor(h4 / F.lit(483840)), F.lit(60)),
    )
    keyword = _pick(h4, IPTC_KEYWORDS)
    return F.create_map(
        F.lit("EXIF:Make"), make,
        F.lit("EXIF:Model"), model,
        F.lit("EXIF:ImageWidth"), width.cast("string"),
        F.lit("EXIF:ImageHeight"), height.cast("string"),
        F.lit("EXIF:Orientation"), orientation.cast("string"),
        F.lit("EXIF:DateTimeOriginal"), dto,
        F.lit("IPTC:Keywords"), keyword,
    )


def with_media_tags(
    df: DataFrame, ref_col: str = "media_ref", out_col: str = "tags"
) -> DataFrame:
    """Append the EXIF/IPTC tag map for each media row."""
    return df.withColumn(out_col, exif_tags_expr(ref_col))
