from datalake_polygonscan_spark.streaming.windows import (
    windowed_agg,
    tumbling_window_agg,
    sliding_window_agg,
    session_window_agg,
    stream_dedup,
    run_stream_available_now,
)

__all__ = [
    "windowed_agg",
    "tumbling_window_agg",
    "sliding_window_agg",
    "session_window_agg",
    "stream_dedup",
    "run_stream_available_now",
]
