"""Distributed extraction: salt → shuffle → vectorized dispatch (mapInPandas).

The Spark rebuild of the reference's worker loop (reference:
app/broker/workers.py:58-114 processed one file at a time in one process;
here each Arrow batch of whole documents is extracted vectorized, and
parallelism comes from partitions instead of Dramatiq processes/threads —
run.bat:31-33).

Scale design (100 TB / 10^12-doc framing):

* **Skew defense** — giant PDFs (the 1% long tail with up to 256 page spans)
  are spread by salting on ``pmod(xxhash64(doc_id), P)`` before the shuffle;
  the hash is uniform by construction so no key carries more than ~1/P of
  documents, and P is decoupled from input file layout.
* **One shuffle total** — the only exchange is the salt repartition; the
  extraction itself is a narrow ``mapInPandas`` and the output write is
  pipelined into the same stage.
* **No driver round-trips** — nothing is collected; lineage/audit metrics are
  aggregated distributed (see checkpoint.py).
* **Arrow batch bounds** — per-batch memory is bounded by
  ``spark.sql.execution.arrow.maxRecordsPerBatch`` (set in session helpers);
  the analogue of the reference's raster-size clamps (pdf_fast.py:37-40).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..kernels.dispatch import extract_texts

#: output of the extraction kernel; ``spans`` matches FIXTURES.md §3
#: documents_extracted, plus lineage helper columns.
SPANS_OUT_SCHEMA = (
    "doc_id string, part_id int, n_spans int, n_failures int, "
    "spans array<struct<kind:string,text:string,media_ref:string,order:int>>"
)


def add_partition_salt(df: DataFrame, num_partitions: int) -> DataFrame:
    """Deterministic salt column + shuffle (SURVEY.md §4 skew defense)."""
    return df.withColumn(
        "part_id",
        F.pmod(F.xxhash64(F.col("doc_id")), F.lit(num_partitions)).cast("int"),
    ).repartition(num_partitions, F.col("part_id"))


def _extract_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """Extract one Arrow batch of whole documents (vectorized)."""
    spans_col = pdf["spans"].tolist()
    # Per-document span ordering by input offset (shuffles don't preserve
    # order; the invariant is (doc_id, offset)-sorted sequences).
    ordered = [sorted(sp, key=lambda s: s["offset"]) for sp in spans_col]
    lens = [len(sp) for sp in ordered]

    flat_kind: list = []
    flat_text: list = []
    flat_ref: list = []
    for sp in ordered:
        for s in sp:
            flat_kind.append(s["kind"])
            flat_text.append(s["text"])
            flat_ref.append(s["media_ref"])

    kind_s = pd.Series(flat_kind, dtype=object)
    extracted, failed = extract_texts(
        kind_s, pd.Series(flat_text, dtype=object), pd.Series(flat_ref, dtype=object)
    )
    ext_list = extracted.tolist()
    fail_list = failed.tolist()

    out_spans: list = []
    out_failures: list = []
    pos = 0
    for sp, n in zip(ordered, lens):
        doc_spans = []
        failures = 0
        for order in range(n):
            s = sp[order]
            doc_spans.append(
                {
                    "kind": s["kind"] or "uns",
                    "text": ext_list[pos],
                    "media_ref": s["media_ref"] or "",
                    "order": order,
                }
            )
            failures += int(fail_list[pos])
            pos += 1
        out_spans.append(doc_spans)
        out_failures.append(failures)

    return pd.DataFrame(
        {
            "doc_id": pdf["doc_id"],
            "part_id": pdf["part_id"] if "part_id" in pdf else 0,
            "n_spans": lens,
            "n_failures": out_failures,
            "spans": out_spans,
        }
    )


def _kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        if len(pdf):
            yield _extract_batch(pdf)


def extract_documents(df: DataFrame, num_partitions: int | None = None) -> DataFrame:
    """Full extraction plan over an interleaved documents DataFrame.

    ``df`` must have columns (doc_id, spans) per BASELINE.json input_hint.
    Returns (doc_id, part_id, n_spans, n_failures, spans) with extracted +
    normalized span sequences.
    """
    if num_partitions is None:
        num_partitions = df.sparkSession.sparkContext.defaultParallelism * 2
    salted = add_partition_salt(df, num_partitions)
    return salted.mapInPandas(_kernel, schema=SPANS_OUT_SCHEMA)


def explode_spans(extracted: DataFrame) -> DataFrame:
    """Flat view (doc_id, kind, text, media_ref, order) of extracted spans.

    A narrow generate — no shuffle; feeds the search layer's postings build.
    """
    return extracted.select(
        "doc_id", F.explode("spans").alias("span")
    ).select(
        "doc_id",
        F.col("span.kind").alias("kind"),
        F.col("span.text").alias("text"),
        F.col("span.media_ref").alias("media_ref"),
        F.col("span.order").alias("order"),
    )
