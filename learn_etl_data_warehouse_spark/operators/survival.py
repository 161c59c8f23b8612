"""Survival / churn analysis — the time-to-event family (repeat-purchase
latency, churn curves, component lifetimes). Reference scope:
hariangr/learn_etl_data_warehouse has no survival stage; this extends
the engine's analytics surface with the censoring-aware estimator the
e-family (cohorts e10, latency e26) doesn't cover.

Everything is integer-exact in the repo's fixed-point style: the
estimator is the Nelson–Aalen cumulative HAZARD (a running SUM of
integer-ppm hazards — cross-engine exact), not the Kaplan–Meier
survival PRODUCT (a float chain whose rounding drifts between engines).
S(t) ≈ exp(−H(t)) when a survival curve is wanted downstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def duration_table(
    df: DataFrame,
    subject_col: str,
    ts_col: str,
) -> DataFrame:
    """Time-to-REPEAT-event durations with right censoring: per subject,
    the gap in integer epoch DAYS (the ops02 idiom —
    ``datediff(ts, '1970-01-01')``, type-agnostic across the fixture's
    TIMESTAMP/TIMESTAMP_NTZ flavors) from its first event day to its
    second DISTINCT event day (event = 1; a repeat on the same day is
    not a repeat), or to the global maximum event day when none exists
    (event = 0, censored — the subject was still "alive" when
    observation ended).

    One per-subject aggregation (first + second distinct day via a
    sorted day set, bounded by the subject's own distinct-day count) +
    a broadcast 1-row horizon — no windows over the raw table.
    Returns (``subject_col``, duration_days BIGINT, event BIGINT).
    """
    day = F.datediff(F.col(ts_col), F.lit("1970-01-01")).cast("long")
    days = df.select(F.col(subject_col), day.alias("_day"))
    per = days.groupBy(subject_col).agg(
        F.min("_day").alias("_d1"),
        F.expr(
            "try_element_at(array_sort(collect_set(_day)), 2)"
        ).alias("_d2"),
    )
    horizon = days.agg(F.max("_day").alias("_hmax"))
    j = per.crossJoin(F.broadcast(horizon))
    dur = F.when(
        F.col("_d2").isNotNull(), F.col("_d2") - F.col("_d1")
    ).otherwise(F.col("_hmax") - F.col("_d1"))
    return j.select(
        subject_col,
        dur.cast("long").alias("duration_days"),
        F.col("_d2").isNotNull().cast("long").alias("event"),
    )


def nelson_aalen(
    durations: DataFrame, group_col: str | None = None
) -> DataFrame:
    """Nelson–Aalen cumulative hazard over a right-censored duration
    table (``duration_table`` output): for each distinct EVENT time t,

    - ``at_risk``        subjects with duration ≥ t (events and
      censored alike — censoring removes from risk only after t);
    - ``events``         event-durations exactly at t;
    - ``hazard_ppm``     (10⁶ · events) div at_risk (truncating,
      non-negative — cross-engine exact);
    - ``cum_hazard_ppm`` running sum of hazard_ppm through t.

    at_risk is computed WITHOUT a range join: counts per distinct
    duration, then a descending cumulative sum over the duration grid —
    the grid is bounded by distinct day values (the a26/pf04
    bounded-grid posture: the only window runs over at most a few
    thousand rows regardless of subject count). Returns one row per
    event time, ordered output left to the caller.

    ``group_col`` computes INDEPENDENT hazard curves per group (cohort
    or segment comparison — the survival twin of e10's retention
    matrix): every window partitions by the group, so the grid stays
    bounded per group and groups never share risk sets.
    """
    keys = [group_col] if group_col else []
    counts = durations.groupBy(*keys, "duration_days").agg(
        F.count(F.lit(1)).cast("long").alias("_n_all"),
        F.sum("event").cast("long").alias("events"),
    )
    # at_risk(t) = Σ_{d >= t} n_all(d): cumulative from the largest
    # duration down — one window over the bounded day grid
    w_desc = (
        Window.partitionBy(*keys)
        .orderBy(F.desc("duration_days"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    grid = counts.withColumn(
        "at_risk", F.sum("_n_all").over(w_desc).cast("long")
    )
    ev = grid.filter(F.col("events") > 0).select(
        *keys,
        F.col("duration_days"),
        "at_risk",
        "events",
        F.expr("(1000000 * events) div at_risk").cast("long")
        .alias("hazard_ppm"),
    )
    w_asc = (
        Window.partitionBy(*keys)
        .orderBy("duration_days")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.withColumn(
        "cum_hazard_ppm", F.sum("hazard_ppm").over(w_asc).cast("long")
    )


def hazard_contrast(
    durations: DataFrame,
    group_col: str,
    group_a: str,
    group_b: str,
) -> DataFrame:
    """Two-group hazard contrast (sv03): segment A's and segment B's
    Nelson–Aalen cumulative hazards laid side by side at every event
    time BOTH curves realize — the comparison sv02's independent
    per-segment curves leave to the eye, made exact: the signed
    UNDIVIDED cumulative gap plus a truncating ratio ppm. Comparing
    only at SHARED event times keeps step-function semantics out of
    it (an as-of interpolation would need a tolerance convention;
    shared-time rows are engine-exact by construction — absent where
    curves don't align, never interpolated).

    Same bounded-grid plan as :func:`nelson_aalen` (the contrast is
    one inner join over the ≤ |day-grid| event rows). Returns
    (duration_days, at_risk_a, cum_a_ppm, at_risk_b, cum_b_ppm,
    gap_ppm, ratio_ppm) with ratio NULL when cum_b = 0.
    """
    na = nelson_aalen(
        durations.filter(F.col(group_col).isin([group_a, group_b])),
        group_col,
    )
    a = na.filter(F.col(group_col) == group_a).select(
        "duration_days",
        F.col("at_risk").alias("at_risk_a"),
        F.col("cum_hazard_ppm").alias("cum_a_ppm"),
    )
    b = na.filter(F.col(group_col) == group_b).select(
        "duration_days",
        F.col("at_risk").alias("at_risk_b"),
        F.col("cum_hazard_ppm").alias("cum_b_ppm"),
    )
    return a.join(b, "duration_days").select(
        "duration_days",
        "at_risk_a",
        "cum_a_ppm",
        "at_risk_b",
        "cum_b_ppm",
        (F.col("cum_a_ppm") - F.col("cum_b_ppm")).cast("long").alias(
            "gap_ppm"
        ),
        F.expr(
            "CASE WHEN cum_b_ppm = 0 THEN NULL"
            " ELSE (1000000 * cum_a_ppm) div cum_b_ppm END"
        ).cast("long").alias("ratio_ppm"),
    )
