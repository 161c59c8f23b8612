"""Structured Streaming conformance: the streaming form of each windowed
operator must produce the same rows as its batch twin."""

from __future__ import annotations

import pytest

from learn_etl_data_warehouse_spark.sources.parquet import load_table
from learn_etl_data_warehouse_spark.streaming.events import (
    stream_tumbling_counts,
    tumbling_window_batch,
)


def test_stream_session_window_matches_batch(spark, sf_small, tmp_path):
    """session_window under Structured Streaming (availableNow) must
    reproduce the batch sessionization."""
    from pyspark.sql import functions as F

    from learn_etl_data_warehouse_spark.streaming.events import (
        session_windows_native,
    )

    events = load_table(spark, sf_small, "events")
    staged = str(tmp_path / "events_sess")
    events.write.mode("overwrite").parquet(staged)
    stream = spark.readStream.schema(events.schema).parquet(staged)
    agg = session_windows_native(stream.withWatermark("ts", "1 hour"), gap_minutes=30)
    q = (
        agg.writeStream.format("memory")
        .queryName("t_stream_session")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(120)
    finally:
        q.stop()
    got = sorted(map(tuple, spark.table("t_stream_session").collect()))
    want = sorted(map(tuple, session_windows_native(events, gap_minutes=30).collect()))
    assert got == want


def test_stream_tumbling_matches_batch(spark, sf_small, tmp_path):
    events = load_table(spark, sf_small, "events")
    # Re-stage as microsecond-timestamp parquet (the raw fixture's NANOS
    # physical type is unreadable by the streaming source as well).
    staged = str(tmp_path / "events_stream")
    events.write.mode("overwrite").parquet(staged)
    schema = events.schema

    batch = tumbling_window_batch(events, minutes=10)

    q = (
        stream_tumbling_counts(spark, staged, schema, minutes=10)
        .writeStream.format("memory")
        .queryName("t_stream_tumbling")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(120)
    finally:
        q.stop()
    got = sorted(map(tuple, spark.table("t_stream_tumbling").collect()))
    want = sorted(map(tuple, batch.collect()))
    assert got == want
