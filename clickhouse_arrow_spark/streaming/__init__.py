from clickhouse_arrow_spark.streaming.events import (
    read_events_stream,
    run_to_memory_sink,
    run_to_parquet_sink,
    session_window_agg,
    stateful_running_counts,
    stream_stream_purchase_attribution,
    streaming_dedup,
    tumbling_window_agg,
)

__all__ = [
    "read_events_stream",
    "run_to_memory_sink",
    "run_to_parquet_sink",
    "session_window_agg",
    "stateful_running_counts",
    "stream_stream_purchase_attribution",
    "streaming_dedup",
    "tumbling_window_agg",
]
