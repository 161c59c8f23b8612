"""Column profiling — the data-quality summary a warehouse publishes.

Long-format per-column stats (row count, non-null, null, exact
distinct) computed in ONE pass over the table: a single agg row with
3×N measures, then a ``stack`` to long form. Complements
plans/manifest_warehouse.py::analyze_table (approximate HLL stats kept
as table metadata) with an exact, query-shaped profile whose values an
oracle can verify.

Scale shape: one aggregation — Spark rewrites the multiple
count-distincts with EXPAND (one shuffle, N× row amplification of a
projection that holds only the profiled columns). Exact distinct over
100 TB is inherently a shuffle per column; for monitoring at that
scale prefer analyze_table's HLL path and keep this for audits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def column_profile(df: DataFrame, cols: list[str]) -> DataFrame:
    """Exact long-form profile of ``cols``.

    Returns (column_name, n_rows, n_nonnull, n_null, n_distinct) with
    one row per profiled column; n_distinct ignores NULLs (SQL
    COUNT(DISTINCT) semantics on both engines).
    """
    if not cols:
        raise ValueError("column_profile: cols must be non-empty")
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs.append(F.count(F.col(c)).alias(f"nn_{c}"))
        aggs.append(F.countDistinct(F.col(c)).alias(f"nd_{c}"))
    row = df.agg(*aggs)
    stack_args = ", ".join(f"'{c}', nn_{c}, nd_{c}" for c in cols)
    return row.select(
        F.expr(
            f"stack({len(cols)}, {stack_args})"
            " AS (column_name, n_nonnull, n_distinct)"
        ),
        "n_rows",
    ).select(
        "column_name",
        "n_rows",
        "n_nonnull",
        (F.col("n_rows") - F.col("n_nonnull")).alias("n_null"),
        "n_distinct",
    )
