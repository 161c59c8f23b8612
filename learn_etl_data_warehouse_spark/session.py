"""SparkSession factory.

The reference runs everything eagerly in a single pandas process
(``server.py:26-130``). Here the session is the engine entry point; the
defaults below are chosen for correctness-at-scale:

- AQE on (runtime join-strategy selection, skew-join splitting, partition
  coalescing) — replaces the reference's hand-rolled table-per-partition
  pruning (``server.py:125-130``).
- Arrow enabled for the pandas interchange boundary (ingest shims, pandas
  UDF twins).
- UTC session timezone so timestamp semantics are stable across driver,
  executors, and the DuckDB oracle.
- shuffle partition count left to AQE coalescing on top of an explicit
  initial value sized for the local test harness; on a real cluster this
  should be ~2-3x total cores (set via ``extra_conf``).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_DEFAULTS = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.parquet.filterPushdown": "true",
    "spark.sql.parquet.aggregatePushdown": "true",
    # Runtime bloom-filter join pruning is deliberately LEFT OFF here:
    # measured A/B on the bench corpus showed the filter build over the
    # large exploded side of the dedup joins costs 2-5x (9-18s vs 3.6s
    # for d02) while the star joins gained nothing at this scale. On a
    # real cluster with selective dim predicates over a 100 TB fact,
    # enable it via extra_conf — that is the workload it exists for.
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    # r13 optimization round: prefer shuffled-hash over sort-merge when
    # the planner's size conditions are met, and let AQE rewrite
    # SMJ→SHJ at runtime when every post-shuffle partition fits under
    # 256 MB (guide §3.1/§9). Join results are strategy-independent;
    # the win is skipping both sides' sorts. Driver-verified (PERF_r13,
    # cold JVM, matched calibration 0.806→0.799): ivm01 1.21×, d10
    # 1.24×, t30 1.26×, plus the broad mid-size improvement cluster
    # (st05/st06/d38/d34/s15/d02/sk01/fc05, 1.12-1.32×). The r13
    # session comment's larger claims (g02 "15.3→8.3" etc.) were
    # slow-host-window A/Bs with no calibration — superseded. The
    # quadratic-fan-out self-joins SHJ *hurts* (g02/g08/g09 regressed
    # 11-15% on the driver) carry per-join sort-merge pins at the
    # kernel instead (cooccurrence_edges, common_neighbor_scores,
    # q_g08 — the r14 adjudication), which is guide §3.1's "pick per
    # join" posture. 100 TB note: the STATIC planner's SHJ pick trusts
    # size estimates (side < shuffle.partitions × broadcast threshold,
    # ~2 GB here, and 3× smaller than the other side); a mis-estimated
    # derived frame can pick a build side that OOMs where SMJ would
    # spill. SCALE.md §"join strategy" has the arithmetic; on
    # memory-starved executors flip preferSortMergeJoin back via
    # extra_conf (runtime-settable, regression-tested in
    # tests/test_scale_patterns.py::test_prefer_sort_merge_join_flip).
    "spark.sql.join.preferSortMergeJoin": "false",
    "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold": str(
        256 * 1024 * 1024
    ),
    "spark.sql.shuffle.partitions": "32",
    "spark.ui.enabled": "false",
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
}


def get_spark(
    app_name: str = "learn_etl_data_warehouse_spark",
    master: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default ``*``)
    so the same code runs unchanged under a cluster manager where ``master``
    is injected by spark-submit.
    """
    builder = SparkSession.builder.appName(app_name)
    if master is None and "SPARK_GRAFT_CPUS" in os.environ:
        master = f"local[{os.environ['SPARK_GRAFT_CPUS']}]"
    if master is not None:
        builder = builder.master(master)
    conf = dict(_DEFAULTS)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
