"""Product-analytics operators over the event stream: cohort retention,
growth accounting, and the event-transition matrix.

These are the standard "how is the user base behaving" queries a
warehouse serves next to the revenue rollups (reference analog: the
per-quarter / per-mode endpoint aggregations of server.py:152-299,
lifted to the event-log domain). All three are pure native-Column
compositions — one or two key-shuffles each, no UDFs, no collect — and
every output column is an integer count, a DATE, or a single rounded
ratio of exact integers, so each has an exact DuckDB oracle twin.

Scale notes (100 TB):
- ``cohort_retention`` / ``growth_accounting`` shuffle on ``user_id``
  (the first-touch aggregation) and then on the calendar grain. The
  calendar-grain side is bounded by days-in-range, not data volume, so
  its final join is broadcast-safe by construction.
- ``growth_accounting``'s cumulative window is unpartitioned but runs
  over the per-day aggregate (≤ one row per calendar day) — the same
  bounded-window shape as the d14 shard-offset table, benign at any SF.
- ``transition_matrix`` is one window shuffle on ``user_id`` (sort
  within user by time) followed by a partial-aggregated count shuffle on
  the bounded (from, to) pair — power-law users cost sort time within
  their partition but state never leaves the executor.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def cohort_retention(
    df: DataFrame,
    user: str = "user_id",
    ts: str = "ts",
) -> DataFrame:
    """Weekly retention matrix keyed by first-touch cohort day.

    Each user is assigned to the cohort of their first event's calendar
    day; every later event lands in ``offset_week =
    floor(days_since_cohort / 7)``. Returns one row per (cohort_day,
    offset_week): distinct active users, the cohort's size, and the
    retention ratio. ``offset_week`` 0 always contains the whole cohort.
    """
    firsts = df.groupBy(user).agg(F.min(ts).alias("_first_ts"))
    cohorts = firsts.select(
        F.col(user), F.to_date("_first_ts").alias("cohort_day")
    )
    sizes = cohorts.groupBy("cohort_day").agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    cells = (
        df.select(F.col(user), F.to_date(ts).alias("_day"))
        .join(cohorts, user)
        .groupBy(
            "cohort_day",
            F.floor(F.datediff("_day", F.col("cohort_day")) / 7)
            .cast("long")
            .alias("offset_week"),
        )
        .agg(F.countDistinct(user).alias("active_users"))
    )
    # sizes has ≤ one row per calendar day — bounded, broadcastable.
    # Day grain is exposed as midnight TIMESTAMP (cross-engine-stable in
    # the hash compare; DATE round-trips differently through Arrow).
    return cells.join(F.broadcast(sizes), "cohort_day").select(
        F.col("cohort_day").cast("timestamp").alias("cohort_day"),
        "offset_week",
        "active_users",
        "cohort_size",
        F.round(
            F.col("active_users").cast("double")
            / F.col("cohort_size").cast("double"),
            6,
        ).alias("retention"),
    )


def growth_accounting(
    df: DataFrame,
    user: str = "user_id",
    ts: str = "ts",
) -> DataFrame:
    """Daily active / new / cumulative user counts.

    Returns one row per calendar day with events: ``dau`` (distinct
    active users), ``new_users`` (users whose first-ever event is that
    day), and ``cum_users`` (running total of new users — the
    cumulative-distinct trick: first occurrence per user, then a running
    sum, because COUNT(DISTINCT) OVER a growing frame is not a
    window-able aggregate).
    """
    days = df.select(F.to_date(ts).alias("day"), F.col(user))
    dau = days.groupBy("day").agg(F.countDistinct(user).alias("dau"))
    news = (
        days.groupBy(user)
        .agg(F.min("day").alias("day"))
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("_new"))
    )
    w = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    new_users = F.coalesce("_new", F.lit(0)).cast("long")
    return (
        dau.join(news, "day", "left")
        .select(
            F.col("day").cast("timestamp").alias("day"),
            "dau",
            new_users.alias("new_users"),
            F.sum(new_users).over(w).cast("long").alias("cum_users"),
        )
    )


def transition_matrix(
    df: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    state: str = "event_type",
    tiebreak: str = "event_id",
) -> DataFrame:
    """Per-key consecutive-state transition counts (the Markov view of
    user journeys): for each user's time-ordered event sequence, count
    (state → next state) bigrams and the per-source transition
    probability. ``tiebreak`` pins the order of same-timestamp events so
    the result is deterministic.
    """
    w = Window.partitionBy(key).orderBy(ts, tiebreak)
    nxt = F.lead(state).over(w)
    pairs = (
        df.select(F.col(state).alias("from_state"), nxt.alias("to_state"))
        .filter(F.col("to_state").isNotNull())
        .groupBy("from_state", "to_state")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wp = Window.partitionBy("from_state")
    return pairs.select(
        "from_state",
        "to_state",
        "n",
        F.round(
            F.col("n").cast("double") / F.sum("n").over(wp).cast("double"),
            6,
        ).alias("p"),
    )


def session_paths(
    events: DataFrame,
    gap_minutes: int = 30,
    max_steps: int = 3,
    ts_col: str = "ts",
    key_col: str = "user_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Top-of-session path analysis: the first ``max_steps`` event
    types of each session, joined with '>', counted across sessions.

    Sessionization is the same gaps-and-islands pattern as
    streaming/events.py::session_windows_batch (lag → new-session flag
    → running sum), so paths and session windows agree by
    construction. Ordering inside a session is (ts, event_id) — total,
    so the path string is deterministic cross-engine.

    Scale shape: two key-partitioned windows + two hash aggs; the path
    alphabet (event types) is bounded, so the final count table is
    tiny regardless of input size.
    """
    from pyspark.sql import Window

    gap_us = gap_minutes * 60 * 1_000_000
    byk = Window.partitionBy(key_col).orderBy(
        F.col(ts_col).asc(), F.col("event_id").asc()
    )
    flagged = events.withColumn(
        "_new",
        (
            F.coalesce(
                F.unix_micros(F.col(ts_col))
                - F.unix_micros(F.lag(ts_col).over(byk)),
                F.lit(gap_us + 1),
            )
            > gap_us
        ).cast("long"),
    ).withColumn(
        "_sid",
        F.sum("_new").over(
            byk.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    rn = F.row_number().over(
        Window.partitionBy(key_col, "_sid").orderBy(
            F.col(ts_col).asc(), F.col("event_id").asc()
        )
    )
    steps = flagged.withColumn("_rn", rn).filter(
        F.col("_rn") <= int(max_steps)
    )
    paths = steps.groupBy(key_col, "_sid").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            F.col(ts_col),
                            F.col("event_id"),
                            F.col(type_col),
                        )
                    )
                ),
                lambda s: s[type_col],
            ),
            ">",
        ).alias("path")
    )
    return paths.groupBy("path").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.countDistinct(key_col).alias("n_users"),
    )


def cumulative_new_actors(
    df: DataFrame, actor_col: str = "user_id", ts_col: str = "ts"
) -> DataFrame:
    """Cumulative-distinct growth curve: per day, how many actors were
    seen for the FIRST time, and the running total of distinct actors
    to date — the audience-growth chart, computed exactly without any
    per-day COUNT(DISTINCT) rescan.

    The trick is the first-touch reduction: min(epoch-day) per actor
    (one partial-aggregated shuffle on the actor), then a day-grain
    count and one running sum over the day axis. The final window is a
    single ordered partition over |days| rows — calendar-bounded, the
    pf03 CDF-grid posture, never data-volume.

    Returns (day BIGINT epoch-day, n_new, cum_actors).
    """
    us_per_day = 86_400_000_000
    fd = df.groupBy(F.col(actor_col).alias("_a")).agg(
        F.expr(f"min(unix_micros({ts_col}) div {us_per_day})").alias("day")
    )
    daily = fd.groupBy("day").agg(F.count(F.lit(1)).alias("n_new"))
    w = Window.orderBy("day")
    return daily.select(
        "day",
        "n_new",
        F.sum("n_new").over(w).cast("long").alias("cum_actors"),
    )
