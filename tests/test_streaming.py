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


def test_stateful_running_totals_across_microbatches(spark, sf_small, tmp_path):
    """applyInPandasWithState must accumulate across micro-batches: stage
    the events as 4 files, force 1 file per trigger, and check the final
    per-user row equals the batch aggregate."""
    from learn_etl_data_warehouse_spark.streaming.stateful import (
        batch_user_totals,
        stream_running_user_totals,
    )

    events = load_table(spark, sf_small, "events")
    staged = str(tmp_path / "events_state")
    events.repartition(4).write.mode("overwrite").parquet(staged)
    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(staged)
    )
    q = (
        stream_running_user_totals(stream)
        .writeStream.format("memory")
        .queryName("t_state_totals")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(120)
    finally:
        q.stop()
    # update mode appends one row per user per micro-batch; the final
    # state is the row with the highest n_events per user
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    emitted = spark.table("t_state_totals")
    assert emitted.count() > emitted.select("user_id").distinct().count(), (
        "expected multiple micro-batches to emit interim rows"
    )
    w = Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
    final = (
        emitted.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    got = sorted(map(tuple, final.collect()))
    want = sorted(map(tuple, batch_user_totals(events).collect()))
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
