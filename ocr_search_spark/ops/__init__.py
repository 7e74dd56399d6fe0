"""Training-data-pipeline operators: dedup, similarity search, text analysis,
temporal joins, corpus hygiene/mixing, multimodal column plumbing. All
scale paths are built-in DataFrame ops."""

from .text_analysis import (
    fingerprint_expr,
    grouped_percentiles,
    lang_id_expr,
    quality_metrics,
    token_count_expr,
)
from .dedup import (
    decontaminate,
    exact_dedup_groups,
    jaccard_pairs_exact,
    lsh_candidate_pairs,
    minhash_signatures,
    near_dedup,
    near_dedup_cc,
    simhash_df,
    simhash_expr,
)
from .similarity import (
    cosine_neardup_pairs_exact,
    cosine_neardup_pairs_lsh,
    cosine_topk,
    hyperplane_lsh_buckets,
    ivf_pq_index,
    ivf_pq_search,
    ivf_pq_topk,
    pq_adc_topk,
    pq_codebooks_from_sample,
    pq_encode,
)
from .relational import asof_join, range_join
from .lines import remove_duplicate_lines
from .compress import compression_filter, compression_signals
from .lm import ccnet_buckets, lm_score, lm_vocab_size, ngram_lm
from .scrub import (
    domain_blocklist_filter,
    domain_counts,
    mojibake_filter,
    mojibake_signals,
    redact_pii,
)
from .sampling import (
    deterministic_sample,
    hash_split,
    pack_shards,
    stratified_sample,
    topk_per_group,
)

__all__ = [
    "fingerprint_expr",
    "grouped_percentiles",
    "lang_id_expr",
    "quality_metrics",
    "token_count_expr",
    "decontaminate",
    "exact_dedup_groups",
    "jaccard_pairs_exact",
    "lsh_candidate_pairs",
    "minhash_signatures",
    "near_dedup",
    "near_dedup_cc",
    "simhash_df",
    "simhash_expr",
    "cosine_topk",
    "cosine_neardup_pairs_exact",
    "cosine_neardup_pairs_lsh",
    "hyperplane_lsh_buckets",
    "ivf_pq_index",
    "ivf_pq_search",
    "ivf_pq_topk",
    "pq_adc_topk",
    "pq_codebooks_from_sample",
    "pq_encode",
    "asof_join",
    "range_join",
    "remove_duplicate_lines",
    "compression_filter",
    "compression_signals",
    "ccnet_buckets",
    "lm_score",
    "lm_vocab_size",
    "ngram_lm",
    "domain_blocklist_filter",
    "domain_counts",
    "mojibake_filter",
    "mojibake_signals",
    "redact_pii",
    "deterministic_sample",
    "hash_split",
    "pack_shards",
    "stratified_sample",
    "topk_per_group",
]
