"""Structured Streaming shapes for the events surface (SURVEY §2.13)."""

from mysql2psql_spark.streaming.events import (
    sessionized_stream,
    tumbling_counts_stream,
    windowed_dedup_stream,
)

__all__ = ["tumbling_counts_stream", "sessionized_stream", "windowed_dedup_stream"]
