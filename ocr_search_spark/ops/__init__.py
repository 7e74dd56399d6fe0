"""Training-data-pipeline operators: dedup, similarity search, text analysis,
multimodal column plumbing. All scale paths are built-in DataFrame ops."""

from .text_analysis import (
    fingerprint_expr,
    lang_id_expr,
    quality_metrics,
    token_count_expr,
)
from .dedup import (
    exact_dedup_groups,
    jaccard_pairs_exact,
    lsh_candidate_pairs,
    minhash_signatures,
    simhash_df,
    simhash_expr,
)
from .similarity import (
    cosine_neardup_pairs_exact,
    cosine_neardup_pairs_lsh,
    cosine_topk,
    hyperplane_lsh_buckets,
)

__all__ = [
    "fingerprint_expr",
    "lang_id_expr",
    "quality_metrics",
    "token_count_expr",
    "exact_dedup_groups",
    "jaccard_pairs_exact",
    "lsh_candidate_pairs",
    "minhash_signatures",
    "simhash_df",
    "simhash_expr",
    "cosine_topk",
    "cosine_neardup_pairs_exact",
    "cosine_neardup_pairs_lsh",
    "hyperplane_lsh_buckets",
]
