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


values = st.lists(st.integers(0, 10**12), min_size=1, max_size=60)


@given(values)
@SETTINGS
def test_abc_classification_fuzz_vs_bruteforce(spark, vals):
    from learn_etl_data_warehouse_spark.operators.contribution import (
        abc_classification,
    )

    rows = [(i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "k long, v long")
    got = {r["k"]: r["abc_class"]
           for r in abc_classification(df, "v", "k").collect()}

    total = sum(vals)
    cum, want = 0, {}
    for k, v in sorted(rows, key=lambda r: (-r[1], r[0])):
        cum += v
        want[k] = ("A" if cum * 100 <= total * 80
                   else "B" if cum * 100 <= total * 95 else "C")
    assert got == want


strata = st.lists(
    st.tuples(st.sampled_from(["en", "de", "fr", "ja"]), st.integers(0, 10**6)),
    min_size=1,
    max_size=50,
    unique_by=lambda t: t[1],
)


@given(strata, st.integers(1, 99))
@SETTINGS
def test_exact_stratified_split_fuzz_invariants(spark, rows, pct):
    from learn_etl_data_warehouse_spark.operators.sampling import (
        exact_stratified_split,
    )

    df = spark.createDataFrame(
        [(i, lang) for lang, i in rows], "doc_id long, lang string"
    )
    out = exact_stratified_split(df, train_pct=pct).collect()
    assert len(out) == len(rows)  # no row lost or duplicated
    n = len(rows)
    train = [r for r in out if r["split"] == "train"]
    assert len(train) == (pct * n) // 100  # exact total, always

    # per-stratum quota within one of its proportional share
    per_n, per_t = {}, {}
    for r in out:
        per_n[r["lang"]] = per_n.get(r["lang"], 0) + 1
        if r["split"] == "train":
            per_t[r["lang"]] = per_t.get(r["lang"], 0) + 1
    for lang, nk in per_n.items():
        base = (pct * nk) // 100
        assert per_t.get(lang, 0) in (base, base + 1)
