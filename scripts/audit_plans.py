#!/usr/bin/env python
"""Plan audit: per bench-headliner query, count the physical-plan
features that matter at 100 TB — exchanges (shuffles), broadcasts,
scans, and whether any row-at-a-time Python eval appears (it never
should; BatchEvalPython in a plan is a regression).

Usage:
    python scripts/audit_plans.py [sf_dir]       # default sf0.01

Prints one line per query:  name  exchanges=N broadcasts=N scans=N
and fails loudly (exit 1) if a BatchEvalPython shows up outside the
declared mapInPandas codec kernels (m02-m04, m05) and conformance twins.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
import bench
from learn_etl_data_warehouse_spark.session import get_spark

# ArrowEvalPython / mapInPandas is the declared escape hatch for the
# multimodal codec kernels; row-at-a-time BatchEvalPython is never OK.
PYTHON_OK = {"m02_media_features", "m05_decode_batches"}

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"


def main() -> int:
    spark = get_spark(app_name="letl-dw-audit", master="local[4]")
    queries = entrymod.queries()
    bad = []
    for name in bench.HEADLINE:
        df = queries[name](spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        ex = len(re.findall(r"Exchange (hash|range)partitioning", plan))
        bc = len(re.findall(r"BroadcastExchange", plan))
        scans = len(re.findall(r"Scan parquet|FileScan", plan))
        py_row = len(re.findall(r"BatchEvalPython", plan))
        print(
            f"{name:32s} exchanges={ex:2d} broadcasts={bc} scans={scans}"
            + (f" BatchEvalPython={py_row}!" if py_row else "")
        )
        if py_row and name not in PYTHON_OK:
            bad.append(name)
    if bad:
        print(f"FAIL: row-at-a-time Python eval in: {bad}")
        return 1
    print("plan audit OK: no row-at-a-time Python eval in any headliner")
    return 0


if __name__ == "__main__":
    sys.exit(main())
