from .driver import COUNTER_KEYS, CrawlConfig, CrawlDriver
from .parse import discover_children, encode_seq, position_of

__all__ = ["COUNTER_KEYS", "CrawlConfig", "CrawlDriver", "discover_children", "encode_seq", "position_of"]
