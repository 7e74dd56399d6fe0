"""Link-graph operators: PageRank-style domain authority at corpus scale.

Web-scale training pipelines weight sources by graph authority (the
CommonCrawl-ranking idea: a domain linked by many authoritative domains
is likelier to host quality text). This module implements the standard
damped PageRank iteration Spark-first:

* the graph is an EDGE TABLE (src, dst) — one row per link, however the
  caller derived it (url_domains + registered_domain_expr is the natural
  front end);
* each iteration is one equi-join (rank onto edges by src) + one
  map-side-combinable aggregation (contributions by dst) — the classic
  two-shuffle PageRank step; iterating N times is N chained steps with
  no driver-side data movement (``localCheckpoint`` every few rounds
  truncates the growing lineage, the ``connected_components_labels``
  discipline);
* arithmetic is FIXED-POINT INTEGER end-to-end (``FP_ONE`` units,
  floor-division contributions, integer damping ``(sum * 85) div 100``)
  — the distributed sum is order-independent, so ranks are bit-identical
  on any cluster and the DuckDB oracle (the same iteration unrolled as
  chained CTEs) is hash-exact. Float PageRank would drift with partition
  order; fixed-point is the ``pq_adc_topk``/``ops.classify`` discipline.

Semantics notes (documented simplifications, standard in practice):
dangling nodes (no out-links) do not redistribute their mass — their
rank decays toward the teleport floor; ranks are therefore not a
normalized probability vector, but their ORDER (the useful signal) is
the same. Teleport floor = (1-d)·FP_ONE per node, d = damping/100.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: fixed-point scale: rank 1.0 == 1_000_000 units
FP_ONE = 1_000_000


def graph_nodes(edges: DataFrame) -> DataFrame:
    """Distinct node set of an edge table: (node)."""
    return (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
    )


def pagerank(
    edges: DataFrame,
    n_iter: int = 5,
    damping_pct: int = 85,
    checkpoint_every: int = 4,
) -> DataFrame:
    """Fixed-point damped PageRank over (src, dst) edges: (node, pr_fp).

    ``pr_fp`` starts at ``FP_ONE`` per node; each round every node sends
    ``pr_fp div out_degree`` along each out-edge and receives
    ``(1-d)·FP_ONE + (d · incoming_sum) div 1`` — all integer, so the
    result is engine- and partitioning-independent. Parallel edges are
    honoured (two links A→B carry two contributions), as in the raw web
    graph; pre-aggregate with a weight column upstream if you want
    distinct-link semantics.

    Cost: per round one shuffle keyed on src (rank join) and one on dst
    (contribution sum); the node and degree tables are computed once.
    ``checkpoint_every`` bounds the lineage exactly like the
    connected-components loop.
    """
    if n_iter < 1:
        raise ValueError("n_iter must be >= 1")
    if not 0 < damping_pct < 100:
        raise ValueError("damping_pct must be in (0, 100)")
    nodes = graph_nodes(edges)
    outdeg = edges.groupBy("src").agg(F.count("*").alias("__deg"))
    base = FP_ONE * (100 - damping_pct) // 100
    pr = nodes.select("node", F.lit(int(FP_ONE)).alias("pr_fp"))
    for i in range(n_iter):
        contrib = (
            edges.join(pr, edges["src"] == pr["node"])
            .join(outdeg, "src")
            .select(
                F.col("dst").alias("node"),
                F.expr("pr_fp div __deg").alias("__c"),
            )
            .groupBy("node")
            .agg(F.sum("__c").alias("__in"))
        )
        pr = nodes.join(contrib, "node", "left").select(
            "node",
            (
                F.lit(int(base))
                + F.expr(
                    f"(coalesce(__in, 0L) * {int(damping_pct)}) div 100"
                )
            ).alias("pr_fp"),
        )
        if checkpoint_every and (i + 1) % checkpoint_every == 0 and i + 1 < n_iter:
            pr = pr.localCheckpoint(eager=True)
    return pr


def domain_link_edges(
    df: DataFrame,
    src_domain_col: str,
    text_col: str,
    id_col: str,
) -> DataFrame:
    """(src, dst) registered-domain link edges from documents: the doc's
    own site (``src_domain_col``) links to every registered domain of
    every URL in its text. Self-links are dropped (they carry no
    authority signal). One explode, projection-only domain math."""
    from .scrub import registered_domain_expr, url_domains

    urls = url_domains(
        df.select(F.col(id_col), F.col(src_domain_col), F.col(text_col)),
        id_col,
        text_col,
    )
    with_src = urls.join(
        df.select(
            F.col(id_col).alias("id"),
            F.col(src_domain_col).alias("__src_raw"),
        ),
        "id",
    )
    return (
        with_src.select(
            registered_domain_expr("__src_raw").alias("src"),
            registered_domain_expr("domain").alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
    )


#: one full anchor tag: href attribute + text content (no nested tags)
_ANCHOR_TAG_RE = r'<a\\s[^>]*href="[^"]*"[^>]*>[^<]*</a>'


def html_links(
    docs: DataFrame, id_col: str = "doc_id", spans_col: str = "spans"
) -> DataFrame:
    """Out-link extraction from the RAW interleaved HTML spans — the
    web-graph edge front end (``domain_link_edges``/``pagerank`` consume
    what this emits, and anchor text is the classic relevance signal the
    link-graph training recipes keep).

    Vectorized and JVM-side end to end: explode spans → keep html kind →
    ``regexp_extract_all`` whole anchor tags → ``posexplode`` to one row
    per link (``link_order`` is the in-document link sequence) → two
    projection-only ``regexp_extract`` pulls for href and anchor text.
    Only tags with a double-quoted href and tag-free anchor body match —
    boilerplate-grade extraction, the same contract as the scalar twin
    that generates the oracle golden (Python ``re`` vs Java regex:
    independent engines, identical language subset).

    Output: (id_col, span_offset, link_order, href, anchor) —
    ``link_order`` restarts per span; (id, span_offset, link_order) is
    the unique link key.
    """
    html = docs.select(
        F.col(id_col), F.explode(spans_col).alias("sp")
    ).filter(F.col("sp.kind") == "html")
    tags = html.select(
        F.col(id_col),
        F.col("sp.offset").alias("span_offset"),
        F.posexplode(
            F.expr(f"regexp_extract_all(sp.text, '{_ANCHOR_TAG_RE}', 0)")
        ).alias("link_order", "tag"),
    )
    return tags.select(
        F.col(id_col),
        "span_offset",
        "link_order",
        F.regexp_extract("tag", 'href="([^"]*)"', 1).alias("href"),
        F.regexp_extract("tag", '>([^<]*)</a>', 1).alias("anchor"),
    )
