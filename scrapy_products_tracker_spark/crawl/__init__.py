from .driver import COUNTER_KEYS, CrawlConfig, CrawlDriver
from .parse import discover_children, encode_seq, position_of
from .sitemap import parse_sitemap_entries, sitemap_seed_candidates

__all__ = ["COUNTER_KEYS", "CrawlConfig", "CrawlDriver", "discover_children", "encode_seq", "position_of", "parse_sitemap_entries", "sitemap_seed_candidates"]
