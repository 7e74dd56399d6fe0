"""DocumentStore: the full reference lifecycle as one facade.

Upload → extract → store → search (reference flow §3.1 + §3.2 of SURVEY.md:
app/broker/workers.py:22-126 ingestion into the ``documents`` Postgres table
with its trigger-maintained tsvector, then app/search.py:10-99 querying it).

Spark shape:

* ``ingest`` runs the resumable extraction (checkpoint ledger + audit) and
  materializes two derived tables compute-once-on-write, exactly like the
  reference's trigger (alembic 0001_init.py:36-53): a flat per-document
  ``content`` table (span texts joined — the ``documents.content`` analogue)
  and the inverted ``postings`` table (the tsvector analogue);
* ``search`` mirrors ``search_documents`` semantics over the content table,
  using the postings semi-join scale path.

Table layout notes for 100 TB: all three tables are plain parquet here
(Iceberg runtime jars are not in this sandbox); directory layout and
append/overwrite discipline map 1:1 onto Iceberg tables — swap
``write.parquet`` for ``writeTo(...).append()`` with a catalog configured.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .ops.metadata import metadata_map_expr
from .pipeline import run_extraction
from .pipeline.checkpoint import committed_spans_latest, output_path
from .pipeline.extract import ordered_text_agg
from .search.engine import build_postings, search_documents
from .tables import read_table, write_table


class DocumentStore:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root

    # ---- paths -----------------------------------------------------------
    @property
    def spans_path(self) -> str:
        return output_path(self.root)

    @property
    def content_path(self) -> str:
        return f"{self.root}/content"

    @property
    def postings_path(self) -> str:
        return f"{self.root}/postings"

    # ---- lifecycle -------------------------------------------------------
    def ingest(
        self,
        documents: DataFrame,
        run_group: str = "ingest",
        num_partitions: int | None = None,
        num_groups: int = 4,
    ) -> dict:
        """Extract (resumably) and materialize content + postings tables."""
        stats = run_extraction(
            self.spark,
            documents,
            self.root,
            run_group=run_group,
            num_partitions=num_partitions,
            num_groups=num_groups,
        )
        # read the *published* view (ledgered attempts only) across ALL
        # run_groups — a store ingested in several batches under different
        # run_groups keeps every batch searchable, with the latest
        # publication winning per document (a second ingest of a changed doc
        # supersedes the first). Concatenate in span order (collect_list
        # order is non-contractual), and attach the reference's
        # documents-row companions: filename / path_origin (search.py:92-98
        # link composition) + the exiftool-analogue meta map (models.py:14)
        # explode_outer, not the inner explode_spans flat view: a document
        # whose extraction produced zero spans must still get a content
        # row (the reference always keeps a documents row per file)
        flat = committed_spans_latest(self.spark, self.root).select(
            "doc_id", F.explode_outer("spans").alias("span")
        ).select(
            "doc_id",
            F.col("span.kind").alias("kind"),
            F.coalesce(F.col("span.text"), F.lit("")).alias("text"),
            F.col("span.order").alias("order"),
        )
        ext = F.coalesce(F.min_by("kind", "order"), F.lit("txt"))
        content = flat.groupBy("doc_id").agg(
            ordered_text_agg("text", "order").alias("content"),
            F.concat(F.col("doc_id"), F.lit("."), ext).alias("filename"),
            F.concat(F.lit("store\\"), F.col("doc_id"), F.lit("."), ext).alias(
                "path_origin"
            ),
        )
        content = content.withColumn(
            "meta",
            metadata_map_expr(
                "doc_id",
                "content",
                source_col=F.lit("store"),
                ext=F.regexp_extract("filename", r"\.([a-z]+)$", 1),
            ),
        )
        # KNOWN LIMIT (parquet mode): the two derived-table overwrites are
        # not one atomic publish — a crash between them (or a concurrent
        # reader mid-overwrite) can observe content/postings from
        # different rebuilds until the next ingest. The durable span data
        # itself is protected by the ledgered stage-then-publish protocol
        # and a re-run of ingest rebuilds both views; in Iceberg mode each
        # overwrite is a snapshot commit and readers never see partial
        # tables. A serving deployment should rebuild into fresh paths and
        # swap a pointer, or run on Iceberg.
        write_table(content, self.content_path, mode="overwrite")
        docs = read_table(self.spark, self.content_path)
        write_table(
            build_postings(docs, "doc_id", "content"),
            self.postings_path,
            mode="overwrite",
        )
        return stats

    def search(self, q: str | None, limit: int = 25, offset: int = 0, **filters) -> dict:
        """Reference search semantics over the stored corpus."""
        docs = read_table(self.spark, self.content_path)
        postings = read_table(self.spark, self.postings_path)
        return search_documents(
            docs, q, limit=limit, offset=offset, postings=postings, **filters
        )
