"""Batch/streaming equivalence for the event-stream operators.

Structured Streaming's core contract: the same DataFrame transformation
produces the same result incrementally (readStream) as in batch (read).
These tests drain the events parquet through a memory sink with
``trigger(availableNow=True)`` and hash-compare against the batch plan.
"""

from __future__ import annotations

import pytest

from krnel_graph_spark.streaming.events import (
    run_stream_to_memory,
    sessionize,
    stream_events_from_parquet,
    windowed_event_counts,
)

EVENTS = "/root/testdata/sf0.001/events.parquet"


def _sorted_rows(df, cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


@pytest.fixture(scope="module")
def spark():
    from krnel_graph_spark.runners.spark_runner import get_spark

    return get_spark("test-streaming")


def test_windowed_counts_stream_equals_batch(spark):
    batch = windowed_event_counts(spark.read.parquet(EVENTS), "1 hour")
    stream = windowed_event_counts(
        stream_events_from_parquet(spark, EVENTS), "1 hour"
    )
    query = run_stream_to_memory(stream, "win_counts", output_mode="complete")
    try:
        got = spark.table("win_counts")
        cols = ["window_start", "event_type", "n_events", "sum_value"]
        assert _sorted_rows(got, cols) == _sorted_rows(batch, cols)
        assert len(_sorted_rows(got, cols)) > 0
    finally:
        query.stop()


def test_sessionize_stream_equals_batch(spark):
    batch = sessionize(spark.read.parquet(EVENTS), gap="30 minutes")
    stream = sessionize(stream_events_from_parquet(spark, EVENTS), gap="30 minutes")
    query = run_stream_to_memory(stream, "sessions", output_mode="complete")
    try:
        got = spark.table("sessions")
        cols = ["session_start", "user_id", "n_events", "sum_value"]
        assert _sorted_rows(got, cols) == _sorted_rows(batch, cols)
        assert len(_sorted_rows(got, cols)) > 0
    finally:
        query.stop()


def test_stream_is_incremental(spark):
    """The streaming plan really is a streaming plan (not silently batch)."""
    stream = stream_events_from_parquet(spark, EVENTS)
    assert stream.isStreaming
