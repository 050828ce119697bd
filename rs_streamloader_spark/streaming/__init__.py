from rs_streamloader_spark.streaming.ingest import StreamingLoader
from rs_streamloader_spark.streaming.windows import (
    session_window_agg,
    sliding_window_agg,
    tumbling_window_agg,
)

__all__ = [
    "StreamingLoader",
    "session_window_agg",
    "sliding_window_agg",
    "tumbling_window_agg",
]
