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
