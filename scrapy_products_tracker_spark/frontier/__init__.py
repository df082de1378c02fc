from .merge import merge_inserts, merge_status_updates
from .store import IcebergFrontierStore, SnapshotParquetStore

__all__ = ["merge_inserts", "merge_status_updates", "IcebergFrontierStore", "SnapshotParquetStore"]
