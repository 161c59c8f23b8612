"""Structured Streaming conformance: the streaming form of each windowed
operator must produce the same rows as its batch twin."""

from __future__ import annotations

import pytest

from learn_etl_data_warehouse_spark.sources.parquet import load_table
from learn_etl_data_warehouse_spark.streaming.events import (
    stream_tumbling_counts,
    tumbling_window_batch,
)


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
