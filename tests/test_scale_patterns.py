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
        # the invariant under test is the ELIDED EXCHANGE; the join
        # algorithm on top of the co-located layout is incidental
        # (sort-merge by default, shuffled-hash since the r13
        # preferSortMergeJoin=false session default)
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
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


def test_lsh_probe_prunes_partitioned_index(spark, sf_small, tmp_path):
    """The ANN scale story (similarity.py::lsh_topk docstring): write the
    corpus partitioned by the LSH bucket key and the probe's IN-list
    filter must become partition pruning — only the probed buckets'
    files are read, no full scan."""
    from pyspark.sql import functions as F

    from learn_etl_data_warehouse_spark.operators import similarity
    from learn_etl_data_warehouse_spark.sources.parquet import load_table

    emb = load_table(spark, sf_small, "embeddings")
    indexed = similarity.add_lsh_buckets(emb, dim=64, n_bits=4)
    path = str(tmp_path / "emb_by_bucket")
    indexed.write.mode("overwrite").partitionBy("lsh_bucket").parquet(path)

    table = spark.read.parquet(path)
    q = [float(v) for v in emb.filter(F.col("vec_id") == 3).head()["embedding"]]
    # recompute the probe buckets exactly as lsh_topk does
    probes = []
    q_bucket = 0
    for bit in range(4):
        plane = similarity._hyperplane(64, bit, 42)
        dot = sum(float(a) * b for a, b in zip(q, plane))
        q_bucket += (1 if dot >= 0 else 0) << bit
    probes = [q_bucket] + [q_bucket ^ (1 << b) for b in range(4)]

    probed = table.filter(F.col("lsh_bucket").isin(probes))
    plan = probed._jdf.queryExecution().executedPlan().toString()
    pf = plan.split("PartitionFilters: [")[1].split("]")[0]
    assert "lsh_bucket" in pf, plan[:500]
    # and the probe scoring over the pruned scan matches the in-memory path
    sim = F.round(
        similarity.cosine_similarity(
            F.col("embedding"), F.array(*[F.lit(v) for v in q])
        ),
        6,
    )
    got = [
        r["vec_id"]
        for r in probed.select("vec_id", sim.alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col("vec_id"))
        .limit(5)
        .collect()
    ]
    want = [
        r["vec_id"]
        for r in similarity.lsh_topk(emb, q, k=5, n_bits=4).collect()
    ]
    assert got == want


def test_zorder_layout_skips_more_files_than_linear_sort(spark, sf_small, tmp_path):
    """The layout contract: for a 2-dim range predicate, the z-ordered
    layout must touch fewer files (by footer min/max stats) than a
    layout sorted on only the first dimension — and both must return the
    same rows."""
    from learn_etl_data_warehouse_spark.plans.layout import (
        files_touched,
        write_zordered,
    )

    events = load_table(spark, sf_small, "events").select(
        "event_id", "user_id", "value"
    )
    zpath = str(tmp_path / "z")
    lpath = str(tmp_path / "linear")
    write_zordered(events, zpath, ["user_id", "value"], n_files=16)
    (
        events.repartitionByRange(16, F.col("user_id"))
        .sortWithinPartitions("user_id")
        .write.mode("overwrite").parquet(lpath)
    )
    # a tight box on both dims: selective in user AND value
    lo_u, hi_u = 10.0, 14.0
    lo_v, hi_v = 100.0, 200.0
    preds = {"user_id": (lo_u, hi_u), "value": (lo_v, hi_v)}
    z_touched, z_total = files_touched(spark, zpath, preds)
    l_touched, l_total = files_touched(spark, lpath, preds)
    # range partitioning drops empty partitions (15 distinct users), so
    # totals may land just under n_files
    assert z_total >= 8 and l_total >= 8
    assert z_touched < l_touched, (
        f"z-order should skip more: z={z_touched}, linear={l_touched}"
    )
    # correctness: identical result sets through the normal reader
    cond = (
        (F.col("user_id") >= lo_u) & (F.col("user_id") <= hi_u)
        & (F.col("value") >= lo_v) & (F.col("value") <= hi_v)
    )
    a = sorted(r["event_id"] for r in spark.read.parquet(zpath).filter(cond).collect())
    b = sorted(r["event_id"] for r in spark.read.parquet(lpath).filter(cond).collect())
    assert a == b and a, "same non-empty rows from both layouts"


def test_ranked_zorder_resists_skew(spark, tmp_path):
    """Linear z-scaling collapses under skew (99% of values in one
    narrow range → everything lands in one z-cell on that dim); the
    rank-scaled key must keep spreading, giving strictly better skipping
    on a skewed column."""
    from learn_etl_data_warehouse_spark.plans.layout import (
        files_touched,
        zorder_key,
        zorder_key_ranked,
    )

    # value: 99% uniform in [0, 1), 1% outliers at 1e9 — linear scaling
    # maps the bulk to bucket 0
    rows = [(i, float(i % 100), (1e9 if i % 100 == 99 else i % 97 / 97.0))
            for i in range(5000)]
    df = spark.createDataFrame(rows, "id LONG, a DOUBLE, v DOUBLE")

    for name, keyer in (("lin", zorder_key), ("rank", zorder_key_ranked)):
        zdf, zc = keyer(df, ["a", "v"], bits=8)
        (
            zdf.repartitionByRange(16, F.col(zc)).sortWithinPartitions(zc)
            .drop(zc).write.mode("overwrite")
            .parquet(str(tmp_path / name))
        )
    # predicate on the SKEWED dim's bulk: linear scaling put the whole
    # bulk in z-bucket 0, so no file can be distinguished on v; the
    # rank key spreads the bulk, so files carry narrow v ranges
    preds = {"v": (0.2, 0.4)}
    lin_t, lin_n = files_touched(spark, str(tmp_path / "lin"), preds)
    rank_t, rank_n = files_touched(spark, str(tmp_path / "rank"), preds)
    assert rank_n >= 8 and lin_n >= 8
    assert lin_t == lin_n, "linear-z should touch everything on the skewed dim"
    assert rank_t < lin_t, f"rank={rank_t}/{rank_n} vs linear={lin_t}/{lin_n}"
    # identical rows through the normal reader
    cond = (F.col("v") >= 0.2) & (F.col("v") <= 0.4)
    a = sorted(r["id"] for r in spark.read.parquet(str(tmp_path / "lin")).filter(cond).collect())
    b = sorted(r["id"] for r in spark.read.parquet(str(tmp_path / "rank")).filter(cond).collect())
    assert a == b and a


def test_prefer_sort_merge_join_flip(spark, sf_small):
    """The SHJ session default (r13) must degrade safely at 100 TB: a
    memory-starved deployment flips ``preferSortMergeJoin`` back via
    extra_conf / runtime conf and every shuffle join plans as
    sort-merge again (spill-graceful), with identical results. The conf
    is runtime-settable — this pins the documented escape hatch
    (session.py's cluster-posture note, SCALE.md "join strategy at
    100 TB")."""
    orders = load_table(spark, sf_small, "orders").select(
        "o_orderkey", "o_custkey"
    )
    # the static SHJ pick additionally needs the build side ≥3× smaller
    # (muchSmaller) — keep the probe side wide enough to clear it
    li = load_table(spark, sf_small, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
        "l_extendedprice", "l_returnflag", "l_shipdate"
    )
    def joined():
        # fresh Dataset per probe: a Dataset memoizes its QueryExecution,
        # so a conf change is only visible to a newly built frame
        return orders.join(li, F.col("o_orderkey") == F.col("l_orderkey"))

    prev_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    prev_pref = spark.conf.get("spark.sql.join.preferSortMergeJoin")
    # Suppress broadcast WITHOUT disabling the static SHJ pick: its
    # build-side bound is autoBroadcastJoinThreshold × shuffle
    # partitions (the SCALE.md arithmetic) — threshold −1 would zero
    # that bound too. Half the build side's estimated size keeps
    # broadcast off while size < threshold × partitions stays true.
    build_size = int(
        orders._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
    )
    spark.conf.set(
        "spark.sql.autoBroadcastJoinThreshold", str(max(1, build_size // 2))
    )
    try:
        spark.conf.set("spark.sql.join.preferSortMergeJoin", "false")
        j = joined()
        plan_shj = j._jdf.queryExecution().executedPlan().toString()
        # the session default (estimates permitting) picks shuffled-hash
        assert "ShuffledHashJoin" in plan_shj, plan_shj[:2000]
        n_shj = j.count()

        spark.conf.set("spark.sql.join.preferSortMergeJoin", "true")
        j = joined()
        plan_smj = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan_smj, plan_smj[:2000]
        assert "ShuffledHashJoin" not in plan_smj
        assert j.count() == n_shj
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_bc)
        spark.conf.set("spark.sql.join.preferSortMergeJoin", prev_pref)
