#!/usr/bin/env python
"""Isolated fresh-JVM per-query probe — the adjudication tool for bench
watch-list upticks (CLAUDE.md: verify suspects with the isolated probe,
not by staring at the growing-interleave bench line).

One invocation = ONE fresh JVM running ONE query (or `etl01`) with the
bench harness's exact confs, min-of-N warm reps. Run it 3x per suspect
and compare the min against the query's recorded band at comparable
calibration.

Usage: python scripts/probe_isolated.py <query_name> [reps=3] [sf_dir]
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
    name = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    cal = _calibrate()

    import __spark_entry__ as entrymod
    from learn_etl_data_warehouse_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    conf = {
        "spark.sql.shuffle.partitions": str(max(int(cpus) * 2, 8)),
        "spark.driver.memory": os.environ.get(
            "SPARK_GRAFT_DRIVER_MEM", "48g"
        ),
        "spark.sql.files.maxPartitionBytes": "4m",
    }
    # A/B harness hook (r14): JSON dict of session conf overrides so a
    # single toggle (e.g. preferSortMergeJoin) can be probed in a fresh
    # JVM without editing session.py between runs.
    if os.environ.get("SPARK_GRAFT_PROBE_CONF"):
        import json

        conf.update(json.loads(os.environ["SPARK_GRAFT_PROBE_CONF"]))
    spark = get_spark(
        app_name=f"probe-{name}",
        master=f"local[{cpus}]",
        extra_conf=conf,
    )
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    times = []
    if name == "etl01":
        import bench

        for _ in range(reps):
            t = bench._run_sharded_etl(spark)
            if t is not None:
                times.append(t)
    else:
        q = entrymod.queries()[name]
        for _ in range(reps):
            t0 = time.perf_counter()
            q(spark, sf_dir).write.format("noop").mode("overwrite").save()
            times.append(time.perf_counter() - t0)
            spark.catalog.clearCache()
    print(
        f"{name}: min {min(times):.3f} s, samples "
        f"{[round(t, 3) for t in times]}, cal {cal:.3f}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
