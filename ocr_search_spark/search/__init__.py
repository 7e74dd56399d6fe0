"""Search layer: FTS predicates, ranking, trigram similarity, snippets.

Spark-first rebuild of the reference's Postgres search path
(app/search.py:10-99 + the tsvector trigger alembic/versions/0001_init.py:
31-53 and GIN indexes app/models.py:22-34).
"""

from .analysis import (
    TOKEN_PATTERN,
    fts_match,
    rank_expr,
    snippet_expr,
    tokens_expr,
    trigram_sim_expr,
    trigrams_expr,
)
from .engine import build_postings, search_documents

__all__ = [
    "TOKEN_PATTERN",
    "tokens_expr",
    "trigrams_expr",
    "fts_match",
    "rank_expr",
    "trigram_sim_expr",
    "snippet_expr",
    "search_documents",
    "build_postings",
]
