from ftm_columnstore_spark.streaming.ingest import stream_statements_to_store
from ftm_columnstore_spark.streaming.windows import (
    session_window_agg,
    sliding_window_agg,
    tumbling_window_agg,
)
from ftm_columnstore_spark.streaming.xref import streaming_xref_pairs

__all__ = [
    "session_window_agg",
    "sliding_window_agg",
    "stream_statements_to_store",
    "streaming_xref_pairs",
    "tumbling_window_agg",
]
