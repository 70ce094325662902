"""Structured Streaming surface (SURVEY §2.10)."""

from jurimetria_etl_spark.streaming.windows import (  # noqa: F401
    read_events_stream,
    session_window_counts,
    sliding_window_agg,
    stream_to_parquet,
    tumbling_window_agg,
)
