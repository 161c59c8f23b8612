"""2-D Pareto frontier (skyline) over integer criteria.

A row survives iff no other row is at-least-as-good on both axes and
strictly better on one (minimize ``min_col``, maximize ``max_col``).

Distributed shape — NO all-pairs dominance join:

1. bucket rows by ``min_col div bucket_width``;
2. aggregate a per-bucket max of ``max_col`` (tiny table, one row per
   bucket) and run an *exclusive* running max over it — the only
   unpartitioned window, over a bounded #buckets-row table (same
   benign-bounded-window argument as sampling.py's shard offsets);
3. join the per-bucket "best of all strictly-earlier buckets" back and
   finish with two bucket-partitioned windows: max over strictly-lower
   ``min_col`` within the bucket (RANGE ... 1 PRECEDING) and max over
   ties of ``min_col``.

A row is dominated iff any of the three maxima beats it. Cost is one
shuffle on the bucket key plus a metadata-sized agg; skyline of 100 TB
of rows never pairs rows across partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_NEG_INF = -(1 << 62)


def pareto_frontier_2d(
    df: DataFrame,
    min_col: str,
    max_col: str,
    bucket_width: int = 1000,
) -> DataFrame:
    """Rows not dominated under (minimize min_col, maximize max_col).

    Both criteria must be integral (exact comparisons cross-engine).
    Ties on both axes all survive (domination requires one strict).
    """
    d = df.withColumn("_bkt", F.expr(f"{min_col} div {bucket_width}"))
    bsum = d.groupBy("_bkt").agg(F.max(max_col).alias("_bmax"))
    wb = Window.orderBy("_bkt").rowsBetween(
        Window.unboundedPreceding, -1
    )
    prev = bsum.select(
        "_bkt",
        F.coalesce(F.max("_bmax").over(wb), F.lit(_NEG_INF)).alias(
            "_prev_max"
        ),
    )
    w_lower = (
        Window.partitionBy("_bkt")
        .orderBy(F.col(min_col))
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    w_eq = Window.partitionBy("_bkt", min_col)
    mx = F.col(max_col)
    return (
        d.join(F.broadcast(prev), "_bkt")
        .withColumn(
            "_in_lower",
            F.coalesce(F.max(max_col).over(w_lower), F.lit(_NEG_INF)),
        )
        .withColumn("_eq_max", F.max(max_col).over(w_eq))
        .filter(
            ~(
                (F.col("_prev_max") >= mx)
                | (F.col("_in_lower") >= mx)
                | (F.col("_eq_max") > mx)
            )
        )
        .drop("_bkt", "_prev_max", "_in_lower", "_eq_max")
    )
