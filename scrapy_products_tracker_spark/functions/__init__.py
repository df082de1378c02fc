from .sampling import (
    epoch_repeat,
    mixture_sample,
    shuffle_rank,
    temperature_sample,
    temperature_sample_threshold,
)
from .joins import asof_join, range_join
from .sketches import cms_cells, cms_topk_estimates, hll_distinct, hll_registers
from .text import chunk_windows, dedup_doc_lines, line_dedup_stats, perplexity_buckets, pii_counts, pii_scrub, pii_scrub_stats
from .hashing import bloom_hash_cols, murmur3_32, murmur3_col, murmur3_str, url_hash_col
from .urls import (
    canonicalize_series,
    canonicalize_udf,
    canonicalize_url,
    domain_of,
    domain_of_str,
    path_of_str,
    registrable_domain,
    mark_blocklisted,
)

__all__ = [
    "asof_join",
    "range_join",
    "cms_cells",
    "cms_topk_estimates",
    "hll_distinct",
    "hll_registers",
    "chunk_windows",
    "epoch_repeat",
    "mixture_sample",
    "perplexity_buckets",
    "pii_counts",
    "pii_scrub",
    "pii_scrub_stats",
    "shuffle_rank",
    "temperature_sample",
    "temperature_sample_threshold",
    "bloom_hash_cols",
    "murmur3_32",
    "murmur3_col",
    "murmur3_str",
    "url_hash_col",
    "canonicalize_series",
    "canonicalize_udf",
    "canonicalize_url",
    "domain_of",
    "domain_of_str",
    "path_of_str",
    "registrable_domain",
    "mark_blocklisted",
    "dedup_doc_lines",
    "line_dedup_stats",
]
