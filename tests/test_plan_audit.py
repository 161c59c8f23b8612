"""CI gate for the plan-audit invariant (scripts/audit_plans.py is the
human-readable report; this pins the hard rule): NO bench headliner's
physical plan may contain row-at-a-time Python evaluation
(``BatchEvalPython``) — the engine's hot paths are native Column
expressions, and the only sanctioned Python is the Arrow-batched
mapInPandas codec kernels. A regression here is a 10-100× slowdown at
scale that small-SF bench noise can hide; the plan string can't."""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
import bench

PYTHON_OK = {"m02_media_features", "m05_decode_batches"}


def test_no_row_python_eval_in_headliner_plans(spark, sf_small):
    queries = entrymod.queries()
    offenders = {}
    for name in bench.HEADLINE:
        df = queries[name](spark, sf_small)
        plan = df._jdf.queryExecution().executedPlan().toString()
        n = len(re.findall(r"BatchEvalPython", plan))
        if n and name not in PYTHON_OK:
            offenders[name] = n
    assert not offenders, (
        f"row-at-a-time Python eval leaked into headliner plans: {offenders}"
    )


def test_headliners_exist_and_are_registered(spark):
    """bench.HEADLINE must stay a subset of queries() — a renamed query
    should fail here, not at bench time."""
    queries = entrymod.queries()
    missing = [n for n in bench.HEADLINE if n not in queries]
    assert not missing, f"bench headliners missing from queries(): {missing}"


def test_filters_and_projection_reach_the_scan(spark, sf_small):
    """Catalyst must push q06's predicates into the parquet scan
    (PushedFilters) and prune the projection to the four referenced
    columns (ReadSchema) — the 'free at 100 TB if you stay declarative'
    guarantees. A regression here (e.g. a UDF wrapping the filter column)
    silently turns a 4-column pruned scan into a full-table read."""
    df = entrymod.queries()["q06_forecast_revenue"](spark, sf_small)
    # formatted mode: the default toString truncates long scan lines,
    # which can hide (or fake) the PushedFilters clause
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m, "q06 must read parquet directly"
    read_cols = {c.split(":")[0] for c in m.group(1).split(",") if c}
    assert read_cols == {
        "l_quantity", "l_extendedprice", "l_discount", "l_shipdate"
    }, f"column pruning lost: scan reads {read_cols}"
    pushed = re.search(r"PushedFilters: \[([^\]]*)\]", plan)
    assert pushed and "IsNotNull" in pushed.group(1), (
        "predicates no longer reach the parquet scan"
    )
