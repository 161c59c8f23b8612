"""Property-based conformance for the r5c3 pair/frontier operators:
random inputs vs brute-force Python models (the SURVEY §5 fuzz posture
test_property_cleaning.py applies to the cleaning grammar)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SETTINGS = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

points = st.lists(
    st.tuples(st.integers(0, 500), st.integers(0, 50)),
    min_size=1,
    max_size=40,
)


@given(points)
@SETTINGS
def test_pareto_frontier_fuzz_vs_bruteforce(spark, pts):
    from learn_etl_data_warehouse_spark.operators.skyline import (
        pareto_frontier_2d,
    )

    rows = [(i, p, s) for i, (p, s) in enumerate(pts)]
    df = spark.createDataFrame(rows, "id long, price long, sz long")
    got = {
        r.id
        for r in pareto_frontier_2d(
            df, "price", "sz", bucket_width=64
        ).collect()
    }
    want = {
        i
        for i, p, s in rows
        if not any(
            p2 <= p and s2 >= s and (p2 < p or s2 > s)
            for _, p2, s2 in rows
        )
    }
    assert got == want


intervals = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 40), st.integers(0, 15)),
    min_size=1,
    max_size=30,
)


@given(intervals)
@SETTINGS
def test_interval_overlap_fuzz_vs_bruteforce(spark, ivs):
    from learn_etl_data_warehouse_spark.operators.joins import (
        interval_overlap_join,
    )

    rows = [(k, i, s, s + ln) for i, (k, s, ln) in enumerate(ivs)]
    df = spark.createDataFrame(rows, "k0 long, id long, s long, e long")
    got = {
        (r.id_a, r.id_b)
        for r in interval_overlap_join(
            df, key="k0", start="s", end="e", id_col="id"
        ).collect()
    }
    want = {
        (a[1], b[1])
        for a in rows
        for b in rows
        if a[0] == b[0]
        and a[1] < b[1]
        and a[2] <= b[3]
        and b[2] <= a[3]
    }
    assert got == want
