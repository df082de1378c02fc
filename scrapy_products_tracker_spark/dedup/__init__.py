from .bloom import (
    BloomShards,
    bloom_filter_candidates,
    bloom_mark_candidates,
    build_bloom,
    optimal_params,
    with_bloom_hashes,
)
from .cuckoo import CuckooFilter, cuckoo_mark_candidates
from .exact import dedup_against_frontier, dedup_within_batch

__all__ = [
    "BloomShards",
    "bloom_filter_candidates",
    "bloom_mark_candidates",
    "build_bloom",
    "optimal_params",
    "with_bloom_hashes",
    "CuckooFilter",
    "cuckoo_mark_candidates",
    "dedup_against_frontier",
    "dedup_within_batch",
]
