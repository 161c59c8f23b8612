"""Grouping operators beyond the histogram (SURVEY §2.4 A4-A6, §2.5).

- A4 distinct partition keys (the reference's nav menus) → distinct +
  orderBy (pandas groupby sorts keys; parity needs the explicit sort).
- A5 top-N per group (the reference's ``head(3)`` per quarter) →
  ``row_number`` over a window; deterministic tie-break required because
  Spark (unlike an ordered pandas frame) has no row order.
- A6 per-driver monthly rollup (declared by the by_driver CSV export) →
  date-part group + sums, with map-side partial aggregation for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def distinct_keys(df: DataFrame, key: str) -> DataFrame:
    """A4 — sorted distinct group keys."""
    return df.select(key).distinct().orderBy(key)


def top_n_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list,
    n: int = 3,
) -> DataFrame:
    """A5 — first N rows per group under a total order.

    ``order_cols`` must define a total order (include a unique key as the
    final tiebreak) or results are nondeterministic across runs/engines.
    The window shuffle partitions by group — skew-safe as long as no
    single group dwarfs an executor; for pathological skew pre-aggregate
    or salt upstream.
    """
    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return (
        df.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= n)
        .drop("rn")
    )


def hourly_preagg(
    events: DataFrame,
    ts_col: str = "ts",
    key_cols: list[str] | None = None,
    value_col: str = "value",
    scale: int = 10_000,
) -> DataFrame:
    """Mergeable hourly pre-aggregate — the continuous-aggregate /
    hypertable-rollup pattern: per (hour, keys) keep ONLY states that
    merge associatively (count, fixed-point integer sum, min, max), so
    any coarser grain re-aggregates from this table without touching raw
    events. The sum stays an INTEGER (``sum_fp`` = Σ round(value·scale))
    through every merge level — scaling back to money happens once, at
    the final grain — which is what keeps multi-level rollups
    order-independent and engine-exact (see functions/aggregates.py).

    At 100 TB this is the storage/append side of a streaming rollup: raw
    events aggregate once into hour partitions (map-side partial agg, one
    small shuffle), and every dashboard grain (day/week/month) reads the
    pre-agg, ~10³-10⁴× smaller than raw."""
    keys = key_cols if key_cols is not None else ["event_type"]
    return events.groupBy(
        F.date_trunc("hour", F.col(ts_col)).alias("hour"), *keys
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.round(F.col(value_col) * scale).cast("long")).alias("sum_fp"),
        F.min(value_col).alias("min_value"),
        F.max(value_col).alias("max_value"),
    )


def merge_rollup(
    preagg: DataFrame,
    grain: str = "day",
    time_col: str = "hour",
    key_cols: list[str] | None = None,
    scale: int = 10_000,
    round_to: int = 2,
) -> DataFrame:
    """Re-aggregate a :func:`hourly_preagg` table to a coarser grain by
    MERGING partial states (sum of counts, sum of integer sums, min of
    mins, max of maxes) — never re-reading raw events. The defining
    correctness property (merge ≡ direct aggregation over raw data) is
    what the e07 oracle checks end-to-end."""
    from ..functions.aggregates import _half_up_div

    keys = key_cols if key_cols is not None else ["event_type"]
    s = F.sum("sum_fp")
    out_scale = 10**round_to
    f = scale // out_scale
    money = (
        _half_up_div(s, f).cast("double") / F.lit(out_scale)
        if f > 1
        else F.round(s.cast("double") / F.lit(scale), round_to)
    )
    return preagg.groupBy(
        F.date_trunc(grain, F.col(time_col)).alias("period"), *keys
    ).agg(
        F.sum("n").cast("long").alias("n"),
        money.alias("sum_value"),
        F.min("min_value").alias("min_value"),
        F.max("max_value").alias("max_value"),
    )


def monthly_rollup(
    df: DataFrame,
    ts_col: str,
    key_cols: list[str],
    sum_cols: dict[str, str],
) -> DataFrame:
    """A6 — (year, month, *keys) grain with summed measures.

    ``sum_cols`` maps source column → output alias. Partial (map-side)
    aggregation makes this a single small shuffle of per-partition
    subtotals regardless of input size.
    """
    aggs = [F.sum(src).alias(dst) for src, dst in sum_cols.items()]
    return (
        df.withColumn("year", F.year(ts_col).cast("long"))
        .withColumn("month", F.month(ts_col).cast("long"))
        .groupBy("year", "month", *key_cols)
        .agg(*aggs)
    )
