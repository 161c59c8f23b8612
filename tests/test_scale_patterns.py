"""Scale-pattern evidence: bucketed co-located joins (no shuffle) and
salted skew joins (equivalence with the plain join)."""

from __future__ import annotations

from pyspark.sql import functions as F

from learn_etl_data_warehouse_spark.operators.skew import salted_join
from learn_etl_data_warehouse_spark.sources.parquet import load_table


def test_bucketed_join_has_no_shuffle(spark, sf_small, tmp_path):
    """bucketBy(key) on both sides → the join plan contains no shuffle
    exchange: bucket co-location replaces it (SCALE.md join strategy)."""
    # spark.sql.warehouse.dir is static per-session; bucketed tables land
    # in the default ./spark-warehouse (gitignored) and are dropped below.
    orders = load_table(spark, sf_small, "orders")
    li = load_table(spark, sf_small, "lineitem")
    (
        orders.write.mode("overwrite")
        .bucketBy(4, "o_orderkey")
        .sortBy("o_orderkey")
        .saveAsTable("b_orders")
    )
    (
        li.write.mode("overwrite")
        .bucketBy(4, "l_orderkey")
        .sortBy("l_orderkey")
        .saveAsTable("b_lineitem")
    )
    joined = spark.table("b_orders").join(
        spark.table("b_lineitem"),
        F.col("o_orderkey") == F.col("l_orderkey"),
    )
    # disable broadcast so the test exercises the co-located path
    prev_threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan, (
            "bucketed join must not shuffle"
        )
        assert joined.count() == li.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_threshold)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_salted_join_equals_plain_join(spark, sf_small):
    li = load_table(spark, sf_small, "lineitem")
    supplier = load_table(spark, sf_small, "supplier").withColumnRenamed(
        "s_suppkey", "l_suppkey"
    )
    plain = (
        li.join(supplier, "l_suppkey")
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    salted = (
        salted_join(li, supplier, "l_suppkey", salt_buckets=8)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, salted.collect())
    )
    # the salted big side actually fans the hot key across buckets —
    # even for byte-identical duplicate rows (id-based salt)
    dup_rows = li.limit(1).unionByName(li.limit(1)).unionByName(li)
    salted_keys = (
        dup_rows.withColumn(
            "_salt",
            F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(8)),
        )
        .groupBy("l_suppkey")
        .agg(F.countDistinct("_salt").alias("n_salts"))
    )
    assert salted_keys.agg(F.min("n_salts")).collect()[0][0] >= 2


def test_salted_join_rejects_outer(spark, sf_small):
    li = load_table(spark, sf_small, "lineitem")
    supplier = load_table(spark, sf_small, "supplier").withColumnRenamed(
        "s_suppkey", "l_suppkey"
    )
    import pytest

    with pytest.raises(ValueError, match="inner/left"):
        salted_join(li, supplier, "l_suppkey", how="full")
