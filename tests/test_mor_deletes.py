"""Merge-on-read equality deletes (Iceberg delete-file analog).

The properties under test: a MOR delete is metadata+keys only (no data
partition rewrite), every read path subtracts the keys (snapshot, point
lookup, CDF, clone, restore), materialization folds them into the data
files without moving the logical view, and vacuum/export interact
safely (referenced key files survive; raw-file export refuses while
deletes are pending)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from learn_etl_data_warehouse_spark.plans.manifest_warehouse import (
    add_bloom_index,
    analyze_table,
    clone_table,
    delete_where_mor,
    export_file_manifest,
    manifest_stream_sink,
    materialize_deletes,
    read_manifest,
    read_snapshot,
    read_snapshot_point,
    restore_table,
    snapshot_diff,
    table_stats,
    vacuum,
)


@pytest.fixture()
def vtable(spark, tmp_path):
    """Two-batch manifest table: batch 0 holds ids 0-9 (+ one NULL-v row
    id 99), batch 1 holds ids 100-109."""
    table = str(tmp_path / "vtable")
    os.makedirs(table)
    sink = manifest_stream_sink(table)
    b0 = spark.createDataFrame(
        [(i, float(i), "a" if i % 2 == 0 else "b") for i in range(10)]
        + [(99, None, "a")],
        "id INT, v DOUBLE, cat STRING",
    )
    b1 = spark.createDataFrame(
        [(i, float(i), "c") for i in range(100, 110)],
        "id INT, v DOUBLE, cat STRING",
    )
    sink(b0, 0)
    sink(b1, 1)
    return table, sink


def _rows(df):
    return sorted(
        (r["id"], r["v"], r["cat"]) for r in df.select("id", "v", "cat").collect()
    )


def test_mor_delete_is_metadata_only_and_reads_apply(spark, vtable):
    table, _ = vtable
    parts_before = dict(read_manifest(table)["partitions"])
    pre_txn = read_manifest(table)["txn"]

    txn = delete_where_mor(spark, table, F.col("id") < 3, ["id"])
    assert txn is not None
    m = read_manifest(table)
    # no data partition version moved — the delete is keys + manifest
    assert m["partitions"] == parts_before
    assert m["deletes"] == [{"txn": txn, "cols": ["id"], "n": 3}]
    assert os.path.isdir(os.path.join(table, "_deletes", f"txn={txn}"))

    got = read_snapshot(spark, table)
    assert sorted(r["id"] for r in got.collect()) == [
        3, 4, 5, 6, 7, 8, 9, 99] + list(range(100, 110))
    # time travel to the pre-delete snapshot still shows every row
    old = read_snapshot(spark, table, as_of=pre_txn)
    assert old.count() == 21

    # stacked second delete with a different key tuple
    txn2 = delete_where_mor(spark, table, F.col("cat") == "c", ["id", "cat"])
    assert txn2 is not None
    assert [e["txn"] for e in read_manifest(table)["deletes"]] == [txn, txn2]
    assert sorted(r["id"] for r in read_snapshot(spark, table).collect()) == [
        3, 4, 5, 6, 7, 8, 9, 99]


def test_mor_delete_no_match_is_none_and_no_garbage(spark, vtable):
    table, _ = vtable
    before = read_manifest(table)
    assert delete_where_mor(spark, table, F.col("id") > 1000, ["id"]) is None
    assert read_manifest(table) == before
    assert not os.path.isdir(os.path.join(table, "_deletes"))
    assert not any(
        e.startswith(".txn-staging-") for e in os.listdir(table)
    )


def test_already_deleted_rows_not_recaptured(spark, vtable):
    table, _ = vtable
    delete_where_mor(spark, table, F.col("id") < 3, ["id"])
    # ids 0-2 already logically gone: the second delete file must hold
    # only ids 3 and 4 (capture runs on the live view)
    txn2 = delete_where_mor(spark, table, F.col("v") < 5, ["id"])
    keys = spark.read.parquet(
        os.path.join(table, "_deletes", f"txn={txn2}")
    )
    assert sorted(r["id"] for r in keys.collect()) == [3, 4]
    assert read_manifest(table)["deletes"][1]["n"] == 2


def test_point_lookup_applies_deletes(spark, vtable):
    table, _ = vtable
    add_bloom_index(table, ["id"])
    delete_where_mor(spark, table, F.col("id") == 5, ["id"])
    hit = read_snapshot_point(spark, table, {"id": 5}).filter(
        F.col("id") == 5
    )
    assert hit.count() == 0  # bloom may match the raw file; read must not


def test_materialize_preserves_view_and_reenables_export(spark, vtable):
    table, _ = vtable
    delete_where_mor(spark, table, F.col("id").isin(1, 3), ["id"])
    delete_where_mor(spark, table, F.col("cat") == "c", ["cat"])
    logical = _rows(read_snapshot(spark, table))
    parts_before = dict(read_manifest(table)["partitions"])

    with pytest.raises(ValueError, match="pending merge-on-read"):
        export_file_manifest(table)

    txn = materialize_deletes(spark, table)
    assert txn is not None
    m = read_manifest(table)
    assert m["deletes"] == []
    # both partitions held matches → both rewrote; batch 1 emptied out
    assert m["partitions"]["batch_id=0"] == txn
    assert "batch_id=1" not in m["partitions"]
    assert parts_before["batch_id=0"] != txn
    assert _rows(read_snapshot(spark, table)) == logical
    # raw files are now clean — external export works again
    path = export_file_manifest(table)
    import duckdb

    files = [ln for ln in open(path).read().splitlines() if ln]
    ext = duckdb.sql(
        f"SELECT count(*) FROM read_parquet({files!r}, hive_partitioning=true)"
    ).fetchone()[0]
    assert ext == len(logical)

    # idempotent: nothing pending → no-op
    assert materialize_deletes(spark, table) is None


def test_cdf_emits_mor_deletes_once_and_materialize_diffs_empty(spark, vtable):
    table, _ = vtable
    t0 = read_manifest(table)["txn"]
    delete_where_mor(spark, table, F.col("id").isin(1, 101), ["id"])
    t1 = read_manifest(table)["txn"]

    diff = snapshot_diff(spark, table, t0)
    got = sorted(
        (r["id"], r["_change_type"]) for r in diff.collect()
    )
    assert got == [(1, "delete"), (101, "delete")]

    materialize_deletes(spark, table)
    # logical view unchanged across materialization
    assert snapshot_diff(spark, table, t1).count() == 0
    # and the t0-anchored diff still reports exactly the two deletes
    diff0 = sorted(
        (r["id"], r["_change_type"])
        for r in snapshot_diff(spark, table, t0).collect()
    )
    assert diff0 == [(1, "delete"), (101, "delete")]


def test_vacuum_keeps_referenced_delete_files(spark, vtable):
    table, _ = vtable
    txn = delete_where_mor(spark, table, F.col("id") < 3, ["id"])
    ddir = os.path.join(table, "_deletes", f"txn={txn}")
    vacuum(table, keep_last=1)
    assert os.path.isdir(ddir)  # live manifest references the keys
    assert sorted(r["id"] for r in read_snapshot(spark, table).collect())[0] == 3

    materialize_deletes(spark, table)
    vacuum(table, keep_last=1)
    assert not os.path.isdir(ddir)  # no retained manifest needs it now


def test_clone_carries_pending_deletes(spark, vtable, tmp_path):
    table, _ = vtable
    delete_where_mor(spark, table, F.col("id") < 5, ["id"])
    logical = _rows(read_snapshot(spark, table))
    dst = str(tmp_path / "clone")
    clone_table(table, dst)
    assert _rows(read_snapshot(spark, dst)) == logical
    # divergence: cleaning up the source must not disturb the clone
    materialize_deletes(spark, table)
    vacuum(table, keep_last=1)
    assert _rows(read_snapshot(spark, dst)) == logical


def test_stats_freshness_keys_on_deletes(spark, vtable):
    table, _ = vtable
    analyze_table(spark, table)
    assert table_stats(table)["row_count"] == 21
    delete_where_mor(spark, table, F.col("id") < 3, ["id"])
    assert table_stats(table) is None  # logical rows moved → stale
    analyze_table(spark, table)
    assert table_stats(table)["row_count"] == 18


def test_restore_revives_rows_and_cdf_reports_inserts(spark, vtable):
    table, _ = vtable
    t0 = read_manifest(table)["txn"]
    delete_where_mor(spark, table, F.col("id").isin(2, 4), ["id"])
    t1 = read_manifest(table)["txn"]
    restore_table(table, t0)
    assert read_snapshot(spark, table).count() == 21
    revived = sorted(
        (r["id"], r["_change_type"])
        for r in snapshot_diff(spark, table, t1).collect()
    )
    assert revived == [(2, "insert"), (4, "insert")]


def test_cow_upsert_after_mor_delete_settles_pending_keys(spark, vtable):
    """Regression: a CoW merge re-inserting a MOR-deleted key must not be
    swallowed by the pending anti-join (mutators materialize first)."""
    from learn_etl_data_warehouse_spark.plans.manifest_warehouse import (
        merge_upsert,
    )

    table, _ = vtable
    delete_where_mor(spark, table, F.col("id") == 5, ["id"])
    assert not any(
        r["id"] == 5 for r in read_snapshot(spark, table).collect()
    )
    merge_upsert(
        spark,
        table,
        spark.createDataFrame(
            [(5, 5.5, "back", 0)], "id INT, v DOUBLE, cat STRING, batch_id INT"
        ),
        ["id"],
    )
    m = read_manifest(table)
    assert m["deletes"] == []  # settled before the merge
    got = [r for r in read_snapshot(spark, table).collect() if r["id"] == 5]
    assert [(r["v"], r["cat"]) for r in got] == [(5.5, "back")]
