from .merge import merge_inserts, merge_status_updates
from .store import IcebergFrontierStore, SnapshotParquetStore, frontier_bucket_col

__all__ = [
    "merge_inserts",
    "merge_status_updates",
    "IcebergFrontierStore",
    "SnapshotParquetStore",
    "frontier_bucket_col",
]
