"""Structured Streaming surface of the engine."""

from wd2duckdb_spark.streaming.ingest_stream import (
    ingest_stream,
    read_dump_stream,
)

__all__ = ["ingest_stream", "read_dump_stream"]
