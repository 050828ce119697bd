from rs_streamloader_spark.streaming.ingest import StreamingLoader
from rs_streamloader_spark.streaming.joins import (
    attribution_join,
    attribution_join_outer,
)
from rs_streamloader_spark.streaming.stateful import (
    running_user_stats,
    sessionize_stateful,
)
from rs_streamloader_spark.streaming.windows import (
    session_window_agg,
    sliding_window_agg,
    streaming_dedup,
    tumbling_window_agg,
)

__all__ = [
    "StreamingLoader",
    "attribution_join",
    "attribution_join_outer",
    "running_user_stats",
    "sessionize_stateful",
    "session_window_agg",
    "sliding_window_agg",
    "streaming_dedup",
    "tumbling_window_agg",
]
