from .tables import (
    HISTORY_COLS,
    PRODUCT_TARGET_COLS,
    build_history_rows,
    build_target_rows,
    merge_set_columns,
    upsert_products,
)
from .export import (
    export_category,
    export_history,
    export_session,
    run_incremental_export,
    stop_tracking,
    write_csv,
)
from .revisit import price_change_events, revisit_priority

__all__ = [
    "HISTORY_COLS",
    "PRODUCT_TARGET_COLS",
    "build_history_rows",
    "build_target_rows",
    "merge_set_columns",
    "upsert_products",
    "export_category",
    "export_history",
    "export_session",
    "run_incremental_export",
    "revisit_priority",
    "price_change_events",
    "stop_tracking",
    "write_csv",
]
