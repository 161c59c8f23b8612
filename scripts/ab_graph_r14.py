#!/usr/bin/env python
"""r14 graph-kernel adjudication probe (the r13 verdict's item 1).

One invocation = ONE fresh JVM timing ONE (query, checkpoint_mode)
combination through the noop sink with the bench harness's exact confs,
min-of-N reps. Session conf overrides (the SHJ toggle) come from
$SPARK_GRAFT_PROBE_CONF like probe_isolated.py.

Usage: python scripts/ab_graph_r14.py <g02|g09|t30> <none|edges|ed|both> [reps=3]
"""
from __future__ import annotations

import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def _calibrate(n: int = 20_000_000) -> float:
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        s = 0
        for i in range(n):
            s += i
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    query, mode = sys.argv[1], sys.argv[2]
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cal = _calibrate()

    from pyspark.sql import functions as F

    from learn_etl_data_warehouse_spark.session import get_spark
    from learn_etl_data_warehouse_spark.sources.parquet import load_table

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    conf = {
        "spark.sql.shuffle.partitions": str(max(int(cpus) * 2, 8)),
        "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"),
        "spark.sql.files.maxPartitionBytes": "4m",
    }
    if os.environ.get("SPARK_GRAFT_PROBE_CONF"):
        import json

        conf.update(json.loads(os.environ["SPARK_GRAFT_PROBE_CONF"]))
    spark = get_spark(
        app_name=f"ab-{query}-{mode}", master=f"local[{cpus}]", extra_conf=conf
    )
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    from learn_etl_data_warehouse_spark.operators.graph import (
        cooccurrence_edges,
        pagerank_fixed_point,
        personalized_pagerank,
    )

    def build():
        li = load_table(spark, sf_dir, "lineitem")
        if query == "g02":
            edges = cooccurrence_edges(li)
            return pagerank_fixed_point(
                edges, iterations=5, checkpoint_mode=mode
            ).select(F.col("node").alias("part_id"), "rank_micros")
        if query == "g09":
            # q_g09's exact shape: 30%-order slice, src%50 seeds
            li = li.filter(F.col("l_orderkey") % 10 < 3)
            edges = cooccurrence_edges(li)
            seeds = (
                edges.select("src").filter(F.col("src") % 50 == 0).distinct()
            )
            return personalized_pagerank(
                edges, seeds, iterations=3, checkpoint_mode=mode
            ).select(F.col("node").alias("part_id"), "rank_micros")
        raise SystemExit(f"unknown query {query}")

    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        build().write.format("noop").mode("overwrite").save()
        times.append(time.perf_counter() - t0)
        spark.catalog.clearCache()
    print(
        f"{query} mode={mode} shj="
        f"{spark.conf.get('spark.sql.join.preferSortMergeJoin')} "
        f"min {min(times):.3f} s, samples {[round(t, 3) for t in times]}, "
        f"cal {cal:.3f}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
