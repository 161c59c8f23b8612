"""SCD2 merge semantics over the customer dim."""

from __future__ import annotations

from pyspark.sql import functions as F

from learn_etl_data_warehouse_spark.plans.scd2 import scd2_init, scd2_merge
from learn_etl_data_warehouse_spark.sources.parquet import load_table

ATTRS = ["c_acctbal", "c_mktsegment"]


def test_scd2_versioning(spark, sf_small):
    cust = load_table(spark, sf_small, "customer")
    hist = scd2_init(cust, "c_custkey", "2024-01-01 00:00:00")
    n0 = cust.count()

    # batch 1: change acctbal for keys % 10 == 0, add one new key
    changed = cust.filter(F.col("c_custkey") % 10 == 0).withColumn(
        "c_acctbal", F.col("c_acctbal") + 100.0
    )
    new_row = spark.createDataFrame(
        [(999999, "new customer", 0, 50.0, "BUILDING")], cust.columns
    )
    updates = changed.unionByName(new_row).select("c_custkey", *ATTRS)
    n_changed = changed.count()

    hist2 = scd2_merge(hist, updates, "c_custkey", ATTRS, "2024-02-01 00:00:00")
    hist2 = hist2.cache()

    # every original key still has exactly one open row; new key too
    open_rows = hist2.filter(F.col("is_current"))
    assert open_rows.count() == n0 + 1
    assert open_rows.groupBy("c_custkey").count().filter("count > 1").count() == 0
    # changed keys have exactly one closed historical version
    closed = hist2.filter(~F.col("is_current"))
    assert closed.count() == n_changed
    assert set(
        r["c_custkey"] for r in closed.select("c_custkey").collect()
    ) == set(r["c_custkey"] for r in changed.select("c_custkey").collect())
    # the open version of a changed key carries the new value and window
    one = changed.select("c_custkey").head()["c_custkey"]
    v = open_rows.filter(F.col("c_custkey") == one).collect()[0]
    assert v["valid_from"].isoformat().startswith("2024-02-01")
    assert v["valid_to"] is None

    # idempotence: re-applying the same updates is a no-op
    hist3 = scd2_merge(hist2, updates, "c_custkey", ATTRS, "2024-03-01 00:00:00")
    assert hist3.count() == hist2.count()
    assert hist3.filter(F.col("is_current")).count() == n0 + 1


def test_j6_dim_denormalization_consistent(spark):
    """J6 (SURVEY §2.3): the masters carry denormalized kelurahan names;
    re-deriving them through the kelurahan dim must agree."""
    import os

    import pytest

    assets = "/root/reference/assets/oltp"
    if not os.path.exists(assets + "/master_user.xlsx"):
        pytest.skip("reference assets not present")
    from learn_etl_data_warehouse_spark.plans.warehouse import load_ojol_dims

    dims = load_ojol_dims(spark, assets)
    kel = dims["kelurahan"].select(
        F.col("kelurahan_id").alias("_kid"),
        F.col("kelurahan_name").alias("_kname"),
        F.col("kecamatan_name").alias("_cname"),
    )
    for name in ["user", "driver"]:
        joined = dims[name].join(
            F.broadcast(kel), dims[name]["kelurahan_id"] == F.col("_kid"), "left"
        )
        bad = joined.filter(
            (F.col("kelurahan_name") != F.col("_kname"))
            | (F.col("kecamatan_name") != F.col("_cname"))
        ).count()
        assert bad == 0, f"{name}: denormalized names disagree with the dim"


def test_scd2_null_value_transitions(spark):
    """A null->value or value->null attribute change must close the old
    version and open a new one (plain equality yields a NULL predicate and
    silently drops the update — regression test for the eqNullSafe fix)."""
    base = spark.createDataFrame(
        [(1, None, "SEG_A"), (2, 5.0, None), (3, 7.0, "SEG_C")],
        "c_custkey int, c_acctbal double, c_mktsegment string",
    )
    hist = scd2_init(base, "c_custkey", "2024-01-01 00:00:00")
    updates = spark.createDataFrame(
        [
            (1, 9.0, "SEG_A"),   # null -> value
            (2, 5.0, "SEG_B"),   # null -> value (other attr)
            (3, None, "SEG_C"),  # value -> null
        ],
        "c_custkey int, c_acctbal double, c_mktsegment string",
    )
    hist2 = scd2_merge(hist, updates, "c_custkey", ATTRS, "2024-02-01 00:00:00").cache()

    open_rows = {r["c_custkey"]: r for r in hist2.filter("is_current").collect()}
    closed = {r["c_custkey"]: r for r in hist2.filter("NOT is_current").collect()}
    assert set(open_rows) == {1, 2, 3} and set(closed) == {1, 2, 3}
    assert open_rows[1]["c_acctbal"] == 9.0
    assert open_rows[2]["c_mktsegment"] == "SEG_B"
    assert open_rows[3]["c_acctbal"] is None
    for k in (1, 2, 3):
        assert open_rows[k]["valid_from"].isoformat().startswith("2024-02-01")
        assert closed[k]["valid_to"].isoformat().startswith("2024-02-01")

    # idempotence still holds with nulls in play
    hist3 = scd2_merge(hist2, updates, "c_custkey", ATTRS, "2024-03-01 00:00:00")
    assert hist3.count() == hist2.count()
