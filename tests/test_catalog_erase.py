"""Catalog-wide GDPR erasure: logical erase in ONE multi-table txn,
then physical purge + vacuum removing the subject's bytes from disk.

Properties under test: the erase flips every member table carrying the
key in a single catalog swap (no half-erased view), tables without the
column are untouched, catalog time travel still shows the pre-erase
state until vacuumed, and after purge+vacuum a byte-level scan of every
parquet file under the catalog finds the subject nowhere."""

from __future__ import annotations

import glob
import os

import duckdb
import pytest
from pyspark.sql import functions as F

from learn_etl_data_warehouse_spark.plans.catalog import (
    catalog_commit,
    catalog_erase_key,
    catalog_purge_table,
    catalog_read,
    catalog_vacuum,
    read_catalog,
)


@pytest.fixture()
def warehouse(spark, tmp_path):
    cdir = str(tmp_path / "cat")
    docs = spark.createDataFrame(
        [(u, d, f"text-{u}-{d}") for u in range(5) for d in range(3)],
        "user_id INT, doc_id INT, text STRING",
    )
    activity = spark.createDataFrame(
        [(u, e, u * 100 + e) for u in range(5) for e in range(2)],
        "user_id INT, event_id INT, value INT",
    )
    dims = spark.createDataFrame(
        [(1, "a"), (2, "b")], "dim_id INT, label STRING"
    )
    catalog_commit(
        spark,
        cdir,
        {
            "docs": (docs, []),
            "activity": (activity, []),
            "dims": (dims, []),
        },
    )
    return cdir


def test_erase_flips_all_tables_in_one_txn(spark, warehouse):
    cdir = warehouse
    cat0 = read_catalog(cdir)
    txn = catalog_erase_key(spark, cdir, "user_id", [2, 3])
    assert txn is not None
    cat1 = read_catalog(cdir)
    assert cat1["seq"] == cat0["seq"] + 1  # ONE catalog transaction
    # both key-carrying tables moved to txns of THIS erase; dims untouched
    assert cat1["tables"]["docs"] == f"{txn}-docs"
    assert cat1["tables"]["activity"] == f"{txn}-activity"
    assert cat1["tables"]["dims"] == cat0["tables"]["dims"]

    for name, expect in (("docs", 9), ("activity", 6)):
        df = catalog_read(spark, cdir, name)
        assert df.count() == expect
        assert df.filter(F.col("user_id").isin(2, 3)).count() == 0
    assert catalog_read(spark, cdir, "dims").count() == 2

    # whole-warehouse time travel still shows the subject pre-erase
    old_docs = catalog_read(spark, cdir, "docs", as_of=cat0["txn"])
    assert old_docs.filter(F.col("user_id") == 2).count() == 3


def test_erase_absent_subject_is_noop(spark, warehouse):
    cdir = warehouse
    before = read_catalog(cdir)
    assert catalog_erase_key(spark, cdir, "user_id", [999]) is None
    assert read_catalog(cdir) == before


def _subject_bytes_on_disk(cdir: str, user_id: int) -> int:
    total = 0
    for path in glob.glob(os.path.join(cdir, "**", "*.parquet"), recursive=True):
        cols = duckdb.sql(f"SELECT * FROM read_parquet('{path}') LIMIT 0").columns
        if "user_id" in cols:
            total += duckdb.sql(
                f"SELECT count(*) FROM read_parquet('{path}') "
                f"WHERE user_id = {user_id}"
            ).fetchone()[0]
    return total


def test_purge_and_vacuum_remove_subject_bytes(spark, warehouse):
    cdir = warehouse
    catalog_erase_key(spark, cdir, "user_id", [4])
    # logically gone, but raw bytes remain (incl. the delete-key files)
    assert _subject_bytes_on_disk(cdir, 4) > 0

    docs_before = sorted(
        (r["user_id"], r["doc_id"])
        for r in catalog_read(spark, cdir, "docs").collect()
    )
    catalog_purge_table(spark, cdir, "docs")
    catalog_purge_table(spark, cdir, "activity")
    catalog_vacuum(cdir, keep_last=1)

    assert _subject_bytes_on_disk(cdir, 4) == 0  # bytes truly gone
    docs_after = sorted(
        (r["user_id"], r["doc_id"])
        for r in catalog_read(spark, cdir, "docs").collect()
    )
    assert docs_after == docs_before  # purge is a logical no-op
    assert catalog_read(spark, cdir, "activity").count() == 8  # 10 − user 4's 2
