from clickhouse_arrow_spark.streaming.events import (
    read_events_stream,
    run_to_memory_sink,
    session_window_agg,
    stateful_running_counts,
    streaming_dedup,
    tumbling_window_agg,
)

__all__ = [
    "read_events_stream",
    "run_to_memory_sink",
    "session_window_agg",
    "stateful_running_counts",
    "streaming_dedup",
    "tumbling_window_agg",
]
