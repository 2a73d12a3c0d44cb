"""Structured Streaming verification: the streaming windowed aggregation
must produce the same result as its batch twin (unified API contract), and
session_window must cover all events."""

from __future__ import annotations

from mini_hive_server_spark import registry
from mini_hive_server_spark.streaming.events_stream import (
    hourly_windowed_counts,
    read_events_stream,
    run_to_memory,
    session_window_counts,
)

from .conftest import SF_SMOKE


def test_streaming_hourly_matches_batch(spark):
    stream = read_events_stream(spark, SF_SMOKE)
    run_to_memory(hourly_windowed_counts(stream), "stream_hourly")
    streamed = {
        tuple(r) for r in spark.table("stream_hourly").collect()
    }
    batch_df = registry.queries()["events_tumbling_hourly"](spark, SF_SMOKE)
    batch = {tuple(r) for r in batch_df.collect()}
    assert streamed == batch


def test_session_window_covers_all_events(spark):
    stream = read_events_stream(spark, SF_SMOKE)
    run_to_memory(session_window_counts(stream), "stream_sessions")
    out = spark.table("stream_sessions")
    total = sum(r["n_events"] for r in out.collect())
    n_events = spark.read.parquet(f"{SF_SMOKE}/events.parquet").count()
    assert total == n_events
    # sessions are per-user and non-empty
    assert out.filter("n_events <= 0").count() == 0
