"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video spans are carried as ``binary`` columns with a typed
metadata struct. The Spark-side plumbing — schema, partition-safe batch
iteration, Arrow-friendly UDF signatures — is real and tested; the actual
codec work (image decode, resampling, frame sampling) is STUBBED because the
media libraries are not present in this environment: a deterministic fake
"decode" derives stable feature values from the payload bytes so pipelines
and tests exercise the full path, and ``decode_real`` raises
``NotImplementedError`` where a PIL/ffmpeg call would go.

The stub's hash basis is ``md5(HEX(payload))`` — the hex detour keeps every
derived value (fingerprint, dims, feature vector) reproducible in any SQL
engine whose md5 only accepts strings (DuckDB), so the whole operator is
oracle-checkable end to end.

Reference lineage: the reference shells out to ExifTool for metadata
(app/services/metadata.py:8-37) and Tesseract for pixels (pdf_fast.py:
188-201); both are process-boundary black boxes there too.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

MEDIA_SCHEMA = (
    "media_ref string, payload binary, mime string, "
    "meta map<string,string>"
)

FEATURES_SCHEMA = (
    "media_ref string, n_bytes long, fingerprint string, "
    "width int, height int, feature array<float>"
)


def decode_real(payload: bytes, mime: str):
    """Where a real decoder (PIL / ffmpeg) would be called."""
    raise NotImplementedError(
        "media codecs are not available in this environment; "
        "use extract_media_features (deterministic stub) instead"
    )


def payload_fingerprint(payload: bytes) -> str:
    """Engine-portable content hash: md5 over the uppercase hex encoding.

    Equals ``md5(hex(payload))`` in Spark SQL and DuckDB (both emit
    uppercase hex), so dedup/lineage joins on it are oracle-checkable.
    """
    return hashlib.md5((payload or b"").hex().upper().encode()).hexdigest()


def _stub_decode(payload: bytes) -> tuple[int, int, list[float]]:
    """Deterministic fake decode: stable dims + 8-dim feature from bytes.

    Derivation bytes are the fingerprint digest, so every value is a pure
    function of the payload reproducible as SQL over hex pairs.
    """
    h = bytes.fromhex(payload_fingerprint(payload))
    width = 64 + h[0] % 192
    height = 64 + h[1] % 192
    feature = [round(b / 255.0, 6) for b in h[2:10]]
    return width, height, feature


def media_features_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: binary payload batch → feature rows.

    Batch shape is the contract a real decoder drops into: whole Arrow
    batches in, vectorized columns out, no Spark-level per-row Python.
    """
    for pdf in batches:
        if not len(pdf):
            continue
        payloads = pdf["payload"].map(lambda b: bytes(b) if b is not None else b"")
        decoded = payloads.map(_stub_decode)
        yield pd.DataFrame(
            {
                "media_ref": pdf["media_ref"],
                "n_bytes": payloads.map(len).astype("int64"),
                "fingerprint": payloads.map(payload_fingerprint),
                "width": decoded.map(lambda t: t[0]).astype("int32"),
                "height": decoded.map(lambda t: t[1]).astype("int32"),
                "feature": decoded.map(lambda t: np.array(t[2], dtype="float32")),
            }
        )


def extract_media_features(media: DataFrame) -> DataFrame:
    """Distributed media feature extraction over a MEDIA_SCHEMA table."""
    return media.mapInPandas(media_features_kernel, schema=FEATURES_SCHEMA)


RESIZED_SCHEMA = (
    "media_ref string, width int, height int, thumb_fp string, n_bytes long"
)


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Thumbnail/resize plumbing: whole-batch kernel producing fixed-dim
    outputs. The pixel resample is stubbed (no codec libs here):
    ``thumb_fp`` is a deterministic function of (payload, target dims) —
    md5(fingerprint:WxH) — standing in for the resampled bytes' hash, so
    the batch shape, schema, and lineage are real and oracle-checkable.
    A real deployment swaps the fp line for PIL ``Image.resize``.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            payloads = pdf["payload"].map(
                lambda b: bytes(b) if b is not None else b""
            )
            fps = payloads.map(payload_fingerprint)
            yield pd.DataFrame(
                {
                    "media_ref": pdf["media_ref"],
                    "width": width,
                    "height": height,
                    "thumb_fp": fps.map(
                        lambda f: hashlib.md5(
                            f"{f}:{width}x{height}".encode()
                        ).hexdigest()
                    ),
                    "n_bytes": payloads.map(len).astype("int64"),
                }
            ).astype({"width": "int32", "height": "int32"})

    return media.mapInPandas(kernel, schema=RESIZED_SCHEMA)


FRAMES_SCHEMA = "media_ref string, frame_idx int, frame_fp string"


def sample_frames(media: DataFrame, every_n: int = 2) -> DataFrame:
    """Frame-sampling plumbing for video-like payloads: one row per sampled
    frame. The 'decoder' treats each 16-byte payload chunk as a frame
    (deterministic stand-in for an ffmpeg demux); a real deployment swaps
    the chunker for frame extraction and keeps the fan-out shape: batch in,
    variable rows out, frame_fp = content hash for downstream dedup/ANN.
    """
    if every_n < 1:
        raise ValueError("every_n must be >= 1")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            refs, idxs, fps = [], [], []
            for ref, payload in zip(pdf["media_ref"], pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                n_frames = len(b) // 16
                for k in range(0, n_frames, every_n):
                    refs.append(ref)
                    idxs.append(k)
                    fps.append(
                        hashlib.md5(b[k * 16 : (k + 1) * 16].hex().upper().encode()).hexdigest()
                    )
            if refs:
                yield pd.DataFrame(
                    {"media_ref": refs, "frame_idx": idxs, "frame_fp": fps}
                ).astype({"frame_idx": "int32"})

    return media.mapInPandas(kernel, schema=FRAMES_SCHEMA)


def synth_media_df(spark, n: int = 64, groups: int | None = None) -> DataFrame:
    """Deterministic synthetic media table for tests/demos.

    Payload = md5 digest of the ref, repeated 1 + i % 5 times — 16·reps
    bytes, reconstructible in SQL as ``repeat(unhex(md5(ref)), reps)``.
    With ``groups``, the payload derives from ``ref(i % groups)`` instead
    of the row's own ref, planting exact duplicates (rows i and j collide
    iff i ≡ j mod lcm(groups, 5)) for the dedup operators.
    """
    rows = []
    for i in range(n):
        ref = f"media://synth/{i}"
        base = f"media://synth/{i % groups}" if groups else ref
        payload = bytes.fromhex(hashlib.md5(base.encode()).hexdigest()) * (1 + i % 5)
        rows.append((ref, bytearray(payload), "image/png", {"idx": str(i)}))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def media_near_dedup(
    media: DataFrame,
    threshold: float = 0.999,
    n_bands: int = 16,
    band_size: int = 8,
) -> DataFrame:
    """Feature-space media near-dedup — the full multimodal composition:
    binary payloads → decoded feature vectors → banded-LSH cosine near-dup
    (min-ref keeper) → surviving feature rows.

    With the deterministic stub decoder, features are hash-derived, so only
    byte-identical payloads reach cos ≈ 1 and the outcome equals exact
    dedup — the value is the WIRING: when ``decode_real`` lands,
    perceptually similar media cluster through the identical plan (lower
    the threshold to taste). Scale shape is inherited from
    ``ops.similarity.cosine_near_dedup``: exploded-band shuffle, keyed
    joins, broadcastable loser anti-join — no all-pairs product.
    """
    from .similarity import cosine_near_dedup

    feats = extract_media_features(media)
    return cosine_near_dedup(
        feats,
        dim=8,
        threshold=threshold,
        n_bands=n_bands,
        band_size=band_size,
        id_col="media_ref",
        vec_col="feature",
    )


def media_exact_dedup(media: DataFrame) -> DataFrame:
    """Exact media dedup by content fingerprint — the binary twin of
    ``ops.dedup.exact_dedup_groups``: md5-over-hex groupBy (map-side
    combinable), (fingerprint, n_dups, keeper_ref). The first stage of any
    image/audio dedup pipeline; near-duplicate follows on the decoded
    feature vector via ``ops.similarity``. The hex detour makes the
    fingerprint reproducible in engines whose md5 is string-only."""
    from pyspark.sql import functions as F

    return (
        media.select(
            F.md5(F.hex("payload")).alias("fingerprint"), F.col("media_ref")
        )
        .groupBy("fingerprint")
        .agg(F.count("*").alias("n_dups"), F.min("media_ref").alias("keeper_ref"))
    )


def caption_pairs(
    spans: DataFrame,
    id_col: str = "doc_id",
    media_kind: str = "image",
    order_col: str = "order",
) -> DataFrame:
    """Pair every media span with its nearest text span — the
    LAION/OBELICS-style caption-candidate builder over an interleaved
    text+media document: in a web page or PDF, the text physically
    adjacent to an image is the best zero-shot caption, and
    image-caption pairs are the raw material of multimodal training.

    Input is the flat extracted span table (doc_id, kind, text,
    media_ref, order). A span is a caption candidate if it is not media
    and its extracted text is non-blank. For each media span the nearest
    candidate by span order wins; on an exact distance tie the PRECEDING
    span wins (captions lead their figure more often than they trail it
    — and the rule must be deterministic for the oracle).

    Plan: one per-document window pass, no self-join — ``last(...,
    ignorenulls)`` over the preceding frame and ``first(...,
    ignorenulls)`` over the following frame give each row its nearest
    candidate on both sides in a single sort; documents are independent,
    so the shuffle is the doc-keyed window and skew is bounded by
    max spans per doc (the giant-PDF salt upstream already bounds that).

    Output: (id_col, media_ref, media_order, caption_order, caption,
    distance) — caption NULL when the document has no text spans.
    """
    from pyspark.sql import Window, functions as F

    o = F.col(order_col)
    is_cap = (F.col("kind") != media_kind) & (
        F.length(F.trim(F.col("text"))) > 0
    )
    cand = F.when(
        is_cap, F.struct(o.alias("o"), F.col("text").alias("t"))
    )
    w = Window.partitionBy(id_col).orderBy(order_col)
    prev = F.last(cand, ignorenulls=True).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    nxt = F.first(cand, ignorenulls=True).over(
        w.rowsBetween(1, Window.unboundedFollowing)
    )
    chosen = (
        F.when(prev.isNull(), nxt)
        .when(nxt.isNull(), prev)
        .when(o - prev["o"] <= nxt["o"] - o, prev)
        .otherwise(nxt)
    )
    return (
        spans.withColumn("__c", chosen)
        .filter(F.col("kind") == media_kind)
        .select(
            F.col(id_col),
            F.col("media_ref"),
            o.alias("media_order"),
            F.col("__c")["o"].alias("caption_order"),
            F.col("__c")["t"].alias("caption"),
            F.abs(F.col("__c")["o"] - o).alias("distance"),
        )
    )


def interleave_profile(
    spans: DataFrame,
    id_col: str = "doc_id",
    media_kind: str = "image",
    order_col: str = "order",
) -> DataFrame:
    """Per-document interleave statistics over the extracted span table —
    the data-card row an OBELICS-style multimodal corpus gates on:
    (n_text, n_media, media_ratio_bp, max_media_run). Docs whose media
    ratio is extreme (all-image galleries, imageless walls of text) or
    that carry long uninterrupted image runs (carousels) are poor
    interleaved-training material — this emits the signals, the mixing
    recipe applies the thresholds.

    ``max_media_run`` is the classic gaps-and-islands length: island id
    = ordinal-in-doc minus ordinal-within-kind (two window row_numbers
    over the same doc-keyed sort — ONE shuffle, the second window reuses
    the first's partitioning), then the longest media island per doc.
    ``media_ratio_bp`` is media spans per ten-thousand spans, integer
    division — engine-exact.

    Output: (id_col, n_text, n_media, media_ratio_bp, max_media_run) —
    max_media_run 0 when the doc has no media spans.
    """
    from pyspark.sql import Window, functions as F

    is_media = (F.col("kind") == media_kind).cast("int")
    w_all = Window.partitionBy(id_col).orderBy(order_col)
    w_kind = Window.partitionBy(id_col, "__m").orderBy(order_col)
    marked = spans.select(
        F.col(id_col), F.col(order_col), is_media.alias("__m")
    )
    islands = marked.select(
        F.col(id_col),
        "__m",
        (
            F.row_number().over(w_all) - F.row_number().over(w_kind)
        ).alias("__island"),
    )
    runs = (
        islands.filter(F.col("__m") == 1)
        .groupBy(id_col, "__island")
        .agg(F.count("*").alias("__run"))
        .groupBy(id_col)
        .agg(F.max("__run").alias("max_media_run"))
    )
    counts = marked.groupBy(id_col).agg(
        F.sum(F.lit(1) - F.col("__m")).alias("n_text"),
        F.sum("__m").alias("n_media"),
    )
    return (
        counts.join(runs, id_col, "left")
        .select(
            F.col(id_col),
            "n_text",
            "n_media",
            F.expr("(n_media * 10000) DIV (n_text + n_media)").alias(
                "media_ratio_bp"
            ),
            F.coalesce("max_media_run", F.lit(0)).alias("max_media_run"),
        )
    )
