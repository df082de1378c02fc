from .merge import merge_inserts, merge_status_updates
from .store import CommitConflictError, IcebergFrontierStore, SnapshotParquetStore, frontier_bucket_col

__all__ = [
    "merge_inserts",
    "merge_status_updates",
    "CommitConflictError",
    "IcebergFrontierStore",
    "SnapshotParquetStore",
    "frontier_bucket_col",
]
