from .dedup_stream import dedup_url_stream
from .politeness_stream import admission_stream, expected_admissions
from .price_stream import expected_price_changes, price_change_stream, stream_history
from .results_stream import (
    domain_rate_stream,
    integrity_flags_stream,
    integrity_rate_stream,
    run_to_parquet,
    stream_results,
    windowed_fetch_counts,
)

__all__ = [
    "dedup_url_stream",
    "admission_stream",
    "domain_rate_stream",
    "expected_admissions",
    "expected_price_changes",
    "integrity_flags_stream",
    "integrity_rate_stream",
    "price_change_stream",
    "run_to_parquet",
    "stream_history",
    "stream_results",
    "windowed_fetch_counts",
]
