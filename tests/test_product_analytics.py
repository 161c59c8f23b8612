"""Unit tests for the product-analytics operators (cohort retention,
growth accounting, transition matrix) and the MAD outlier stats —
hand-built frames with worked-by-hand expected values. Cross-engine
value-exactness is separately pinned by the oracle parity gate
(e10/e11/f02/a17)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from learn_etl_data_warehouse_spark.operators.grouped import mad_outliers
from learn_etl_data_warehouse_spark.operators.product_analytics import (
    cohort_retention,
    growth_accounting,
    transition_matrix,
)

_TS = dt.datetime


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )


def test_cohort_retention_hand_built(spark):
    # user 1: cohort Jan 1, active again in week 1 (Jan 8)
    # user 2: cohort Jan 1, never returns
    # user 3: cohort Jan 2, active in week 1 (Jan 9)
    ev = _events(spark, [
        (1, _TS(2024, 1, 1, 10), 1, "view", 0.0),
        (2, _TS(2024, 1, 8, 10), 1, "view", 0.0),
        (3, _TS(2024, 1, 1, 11), 2, "view", 0.0),
        (4, _TS(2024, 1, 2, 9), 3, "view", 0.0),
        (5, _TS(2024, 1, 9, 9), 3, "view", 0.0),
    ])
    got = {
        (r["cohort_day"].date(), r["offset_week"]): (
            r["active_users"], r["cohort_size"], r["retention"]
        )
        for r in cohort_retention(ev).collect()
    }
    assert got == {
        (dt.date(2024, 1, 1), 0): (2, 2, 1.0),
        (dt.date(2024, 1, 1), 1): (1, 2, 0.5),
        (dt.date(2024, 1, 2), 0): (1, 1, 1.0),
        (dt.date(2024, 1, 2), 1): (1, 1, 1.0),
    }


def test_growth_accounting_hand_built(spark):
    ev = _events(spark, [
        (1, _TS(2024, 1, 1, 8), 1, "view", 0.0),
        (2, _TS(2024, 1, 1, 9), 2, "view", 0.0),
        (3, _TS(2024, 1, 2, 8), 1, "view", 0.0),   # returning only
        (4, _TS(2024, 1, 3, 8), 3, "view", 0.0),   # new + user 1 returns
        (5, _TS(2024, 1, 3, 9), 1, "view", 0.0),
    ])
    got = {
        r["day"].date(): (r["dau"], r["new_users"], r["cum_users"])
        for r in growth_accounting(ev).collect()
    }
    assert got == {
        dt.date(2024, 1, 1): (2, 2, 2),
        dt.date(2024, 1, 2): (1, 0, 2),
        dt.date(2024, 1, 3): (2, 1, 3),
    }


def test_transition_matrix_counts_and_probabilities(spark):
    # user 1: view -> click -> view ; user 2: view -> view
    ev = _events(spark, [
        (1, _TS(2024, 1, 1, 8), 1, "view", 0.0),
        (2, _TS(2024, 1, 1, 9), 1, "click", 0.0),
        (3, _TS(2024, 1, 1, 10), 1, "view", 0.0),
        (4, _TS(2024, 1, 1, 8), 2, "view", 0.0),
        (5, _TS(2024, 1, 1, 9), 2, "view", 0.0),
    ])
    got = {
        (r["from_state"], r["to_state"]): (r["n"], r["p"])
        for r in transition_matrix(ev).collect()
    }
    assert got == {
        ("view", "click"): (1, 0.5),
        ("view", "view"): (1, 0.5),
        ("click", "view"): (1, 1.0),
    }


def test_transition_matrix_same_ts_tiebreak(spark):
    # identical timestamps: event_id order decides the sequence
    ev = _events(spark, [
        (10, _TS(2024, 1, 1, 8), 1, "signup", 0.0),
        (11, _TS(2024, 1, 1, 8), 1, "view", 0.0),
        (12, _TS(2024, 1, 1, 8), 1, "purchase", 0.0),
    ])
    got = {
        (r["from_state"], r["to_state"]) for r in transition_matrix(ev).collect()
    }
    assert got == {("signup", "view"), ("view", "purchase")}


def test_mad_outliers_odd_group_with_spike(spark):
    # values 1,1,1,1,100 -> median_fp 10000, devs [0,0,0,0,990000],
    # MAD 0 -> the spike is the single dev > 3*0
    ev = _events(spark, [
        (i, _TS(2024, 1, 1, 8), 1, "a", v)
        for i, v in enumerate([1.0, 1.0, 1.0, 1.0, 100.0])
    ])
    [r] = mad_outliers(ev, keys=["event_type"], value="value").collect()
    assert (r["n"], r["median_fp"], r["mad_fp"], r["n_outliers"]) == (
        5, 10000.0, 0.0, 1
    )


def test_mad_outliers_even_group_interpolates(spark):
    # values 1,2,3,4 -> median 2.5 (25000 fp), devs [15000,5000,5000,15000],
    # MAD = (5000+15000)/2 = 10000; no dev exceeds 3*MAD
    ev = _events(spark, [
        (i, _TS(2024, 1, 1, 8), 1, "a", v)
        for i, v in enumerate([1.0, 2.0, 3.0, 4.0])
    ])
    [r] = mad_outliers(ev, keys=["event_type"], value="value").collect()
    assert (r["n"], r["median_fp"], r["mad_fp"], r["n_outliers"]) == (
        4, 25000.0, 10000.0, 0
    )
