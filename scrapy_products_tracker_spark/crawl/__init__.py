from .driver import COUNTER_KEYS, CrawlConfig, CrawlDriver
from .parse import discover_children, encode_seq, position_of
from .cdx import cdx_index, surt_key
from .sitemap import parse_sitemap_entries, sitemap_seed_candidates
from .warc import read_warc_shards, warc_member_index, write_warc_shards

__all__ = [
    "cdx_index",
    "surt_key",
    "COUNTER_KEYS",
    "CrawlConfig",
    "CrawlDriver",
    "discover_children",
    "encode_seq",
    "position_of",
    "parse_sitemap_entries",
    "sitemap_seed_candidates",
    "read_warc_shards",
    "warc_member_index",
    "write_warc_shards",
]
