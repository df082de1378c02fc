from .bloom import bucket_col, optimal_params, with_bloom_hashes
from .cdc import cdc_chunks, cdc_dedup_stats
from .cuckoo import CuckooFilter
from .exact import anti_join_on_hash, dedup_against_frontier, dedup_within_batch, soft_dedup_weights
from .seen_table import BloomTable, CuckooTable, open_seen_table
from .semantic import bounded_cells, semdedup
from .substring import substring_dedup_clean, substring_dedup_stats
from .text_corpus import curate_corpus, dedup_against_corpus, dedup_corpus

__all__ = [
    "curate_corpus",
    "dedup_against_corpus",
    "dedup_corpus",
    "bounded_cells",
    "semdedup",
    "substring_dedup_clean",
    "substring_dedup_stats",
    "BloomTable",
    "CuckooFilter",
    "CuckooTable",
    "anti_join_on_hash",
    "bucket_col",
    "cdc_chunks",
    "cdc_dedup_stats",
    "dedup_against_frontier",
    "dedup_within_batch",
    "soft_dedup_weights",
    "open_seen_table",
    "optimal_params",
    "with_bloom_hashes",
]
