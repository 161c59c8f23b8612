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
