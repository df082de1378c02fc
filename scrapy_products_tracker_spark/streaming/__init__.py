from .results_stream import (
    stream_results,
    windowed_fetch_counts,
    domain_rate_stream,
    run_to_parquet,
)

__all__ = [
    "stream_results",
    "windowed_fetch_counts",
    "domain_rate_stream",
    "run_to_parquet",
]
