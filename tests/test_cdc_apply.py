"""Full MERGE (merge_apply) and the CDC-apply streaming sink.

Properties under test: a mixed insert/update/delete change set applies
in ONE transaction (no intermediate visible state, one seq increment),
unmatched-delete-only change sets are no-ops, the sink's last-write-wins
reduction respects the CDC sequence (including a delete that wins a
same-key battle), and re-applying a batch is idempotent — the
content-derived exactly-once story."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from learn_etl_data_warehouse_spark.plans.manifest_warehouse import (
    merge_apply,
    manifest_stream_sink,
    read_manifest,
    read_snapshot,
)
from learn_etl_data_warehouse_spark.streaming.sinks import cdc_apply_sink


@pytest.fixture()
def vtable(spark, tmp_path):
    table = str(tmp_path / "vtable")
    os.makedirs(table)
    sink = manifest_stream_sink(table)
    b0 = spark.createDataFrame(
        [(i, float(i), "a" if i % 2 == 0 else "b") for i in range(10)],
        "id INT, v DOUBLE, cat STRING",
    )
    b1 = spark.createDataFrame(
        [(i, float(i), "c") for i in range(100, 110)],
        "id INT, v DOUBLE, cat STRING",
    )
    sink(b0, 0)
    sink(b1, 1)
    return table


def _state(spark, table):
    return sorted(
        (r["id"], r["v"], r["cat"], r["batch_id"])
        for r in read_snapshot(spark, table).collect()
    )


def test_merge_apply_mixed_ops_single_txn(spark, vtable):
    table = vtable
    seq_before = read_manifest(table)["seq"]
    changes = spark.createDataFrame(
        [
            (200, 200.0, "new", 0, "I"),   # insert → routes to batch_id=0
            (5, 55.0, "upd", 0, "U"),      # update in batch_id=0
            (101, None, None, None, "D"),  # delete from batch_id=1
        ],
        "id INT, v DOUBLE, cat STRING, batch_id INT, _op STRING",
    )
    txn = merge_apply(spark, table, changes, ["id"])
    assert txn is not None
    m = read_manifest(table)
    assert m["seq"] == seq_before + 1  # ONE transaction for all three ops
    assert m["partitions"]["batch_id=0"] == txn
    assert m["partitions"]["batch_id=1"] == txn
    st = _state(spark, table)
    assert (200, 200.0, "new", 0) in st
    assert (5, 55.0, "upd", 0) in st
    assert not any(r[0] == 101 for r in st)
    assert len(st) == 20  # 10 + 10 − 1 delete + 1 insert


def test_merge_apply_unmatched_deletes_is_noop(spark, vtable):
    table = vtable
    before = read_manifest(table)
    changes = spark.createDataFrame(
        [(999, None, None, None, "D")],
        "id INT, v DOUBLE, cat STRING, batch_id INT, _op STRING",
    )
    assert merge_apply(spark, table, changes, ["id"]) is None
    assert read_manifest(table) == before


def test_cdc_sink_last_write_wins_and_delete_ties_win(spark, vtable):
    table = vtable
    handle = cdc_apply_sink(table, ["id"], seq_col="_seq")
    batch = spark.createDataFrame(
        [
            # id 3: update at seq 1, delete at seq 2 → net delete
            (3, 33.0, "x", 0, 1, "U"),
            (3, None, None, None, 2, "D"),
            # id 4: delete at seq 1, re-insert at seq 2 → net upsert
            (4, None, None, None, 1, "D"),
            (4, 44.0, "y", 0, 2, "I"),
            # id 7: same-seq U and D → delete wins the tie (no resurrect)
            (7, 77.0, "z", 0, 5, "U"),
            (7, None, None, None, 5, "D"),
        ],
        "id INT, v DOUBLE, cat STRING, batch_id INT, _seq INT, _op STRING",
    )
    handle(batch, 0)
    st = _state(spark, table)
    ids = [r[0] for r in st]
    assert 3 not in ids and 7 not in ids
    assert (4, 44.0, "y", 0) in st
    assert len(st) == 18  # 20 − deletes(3,7) ... id 4 replaced in place


def test_cdc_sink_replay_is_idempotent(spark, vtable):
    table = vtable
    handle = cdc_apply_sink(table, ["id"], seq_col="_seq")
    batch = spark.createDataFrame(
        [
            (1, 11.0, "u", 0, 1, "U"),
            (2, None, None, None, 1, "D"),
            (300, 300.0, "n", 1, 1, "I"),
        ],
        "id INT, v DOUBLE, cat STRING, batch_id INT, _seq INT, _op STRING",
    )
    handle(batch, 0)
    st1 = _state(spark, table)
    handle(batch, 0)  # the crash-replay
    assert _state(spark, table) == st1
    assert (1, 11.0, "u", 0) in st1
    assert not any(r[0] == 2 for r in st1)
    assert (300, 300.0, "n", 1) in st1


def test_cdc_sink_checkpointed_stream_end_to_end(spark, vtable, tmp_path):
    table = vtable
    feed = str(tmp_path / "feed")
    os.makedirs(feed)
    spark.createDataFrame(
        [
            (0, 0.5, "cdc", 0, 1, "U"),
            (9, None, None, None, 1, "D"),
        ],
        "id INT, v DOUBLE, cat STRING, batch_id INT, _seq INT, _op STRING",
    ).coalesce(1).write.mode("overwrite").parquet(feed)
    stream = (
        spark.readStream.schema(
            "id INT, v DOUBLE, cat STRING, batch_id INT, _seq INT, _op STRING"
        ).parquet(feed)
    )
    q = (
        stream.writeStream.foreachBatch(
            cdc_apply_sink(table, ["id"], seq_col="_seq")
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    st = _state(spark, table)
    assert (0, 0.5, "cdc", 0) in st
    assert not any(r[0] == 9 for r in st)
