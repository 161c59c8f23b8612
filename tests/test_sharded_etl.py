"""Per-shard parallel ojol ETL: multi-shard ingest must equal the
single-source pipeline, shard filters must prune, and a shard backfill
must only rewrite that shard's partitions."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from learn_etl_data_warehouse_spark.plans.sharded_etl import (
    SHARD_COL,
    build_sharded_warehouse,
    read_sharded_fact,
    write_sharded_exports,
)
from learn_etl_data_warehouse_spark.plans.warehouse import clean_fact

REF_DB = "/root/reference/assets/oltp/dummy_ojol_transactions_raw_only.sqlite"
FACT_TABLE = "dummy_ojol_transactions_raw_only_query_get_transaction_list_koto"

needs_ref = pytest.mark.skipif(
    not os.path.exists(REF_DB), reason="reference assets not present"
)


@needs_ref
def test_sharded_ingest_matches_single_source(spark, tmp_path):
    from learn_etl_data_warehouse_spark.sources.sqlite import read_sqlite_table

    raw = read_sqlite_table(spark, REF_DB, FACT_TABLE, all_string=True)
    landing = str(tmp_path / "landing")
    write_sharded_exports(raw, landing, n_shards=8)

    sharded = read_sharded_fact(spark, landing)
    # every shard materialized and discovered via the partition layout
    assert sharded.select(SHARD_COL).distinct().count() == 8
    assert sharded.count() == raw.count()

    # cleaned multi-shard output == cleaning the same rows single-source
    # (baseline goes through the same CSV round-trip so null semantics
    # match; the invariant under test is multi-file == one pipeline)
    got = clean_fact(sharded.drop(SHARD_COL))
    want = clean_fact(
        spark.read.csv(landing, sep=";", header=True, inferSchema=False).drop(
            SHARD_COL
        )
    )
    key = [r["id"] for r in got.select("id").collect()]
    assert sorted(key) == sorted([r["id"] for r in want.select("id").collect()])
    cols = sorted(got.columns)
    assert sorted(want.columns) == cols
    g = sorted(map(tuple, got.select(*cols).collect()))
    w = sorted(map(tuple, want.select(*cols).collect()))
    assert g == w


@needs_ref
def test_shard_filter_prunes_scan(spark, tmp_path):
    from learn_etl_data_warehouse_spark.sources.sqlite import read_sqlite_table

    raw = read_sqlite_table(spark, REF_DB, FACT_TABLE, all_string=True)
    landing = str(tmp_path / "landing")
    write_sharded_exports(raw, landing, n_shards=8)

    one = read_sharded_fact(spark, landing).filter(F.col(SHARD_COL) == 3)
    plan = one._jdf.queryExecution().executedPlan().toString()
    # the shard predicate must land in PartitionFilters (file pruning),
    # not as a post-scan row filter
    assert "PartitionFilters" in plan and "_shard" in plan.split("PartitionFilters")[1].split("]")[0]
    full = read_sharded_fact(spark, landing)
    assert one.count() == full.filter(F.col(SHARD_COL) == 3).count() > 0


@needs_ref
def test_shard_backfill_rewrites_only_that_shard(spark, tmp_path):
    from learn_etl_data_warehouse_spark.sources.sqlite import read_sqlite_table

    raw = read_sqlite_table(spark, REF_DB, FACT_TABLE, all_string=True)
    landing = str(tmp_path / "landing")
    wh = str(tmp_path / "wh")
    write_sharded_exports(raw, landing, n_shards=8)

    build_sharded_warehouse(spark, landing, wh)
    table = f"{wh}/fact_by_shard_quarter"
    before = spark.read.parquet(table)
    n_before = before.count()
    others_before = sorted(
        map(tuple, before.filter(F.col(SHARD_COL) != 3).select("id").collect())
    )
    # materialize NOW — the backfill overwrite deletes these files
    old_shard3 = {
        r["id"]: r["distance"]
        for r in before.filter(F.col(SHARD_COL) == 3)
        .select("id", "distance")
        .collect()
    }

    # backfill: shard 3 re-exports with distance doubled
    sharded = read_sharded_fact(spark, landing)
    redo = (
        sharded.filter(F.col(SHARD_COL) == 3)
        .withColumn(
            "distance",
            (F.col("distance").cast("double") * 2).cast("string"),
        )
        .drop(SHARD_COL)
    )
    landing2 = str(tmp_path / "landing2")
    write_sharded_exports(redo, landing2, n_shards=8)  # same hash -> shard 3
    build_sharded_warehouse(spark, landing2, wh, shards=[3])

    after = spark.read.parquet(table)
    # untouched shards byte-identical, same total rows
    assert after.count() == n_before
    others_after = sorted(
        map(tuple, after.filter(F.col(SHARD_COL) != 3).select("id").collect())
    )
    assert others_after == others_before
    # shard 3 carries the backfilled values
    new_shard3 = {
        r["id"]: r["distance"]
        for r in after.filter(F.col(SHARD_COL) == 3)
        .select("id", "distance")
        .collect()
    }
    assert set(new_shard3) == set(old_shard3) and old_shard3
    for rid, d_old in old_shard3.items():
        if d_old and d_old > 0:
            assert new_shard3[rid] == pytest.approx(2 * d_old)
