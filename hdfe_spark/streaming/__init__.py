from hdfe_spark.streaming.ops import (
    read_events_stream,
    streaming_grouped_agg,
    streaming_windowed_agg,
    streaming_lag_transform,
)

__all__ = [
    "read_events_stream",
    "streaming_grouped_agg",
    "streaming_windowed_agg",
    "streaming_lag_transform",
]
