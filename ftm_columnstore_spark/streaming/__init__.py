from ftm_columnstore_spark.streaming.ingest import stream_statements_to_store
from ftm_columnstore_spark.streaming.windows import (
    session_window_agg,
    sliding_window_agg,
    tumbling_window_agg,
)

__all__ = [
    "session_window_agg",
    "sliding_window_agg",
    "stream_statements_to_store",
    "tumbling_window_agg",
]
