"""Market-basket association rules (frequent item pairs).

Extends the engine's co-occurrence surface (graph.py builds the raw
edge list for PageRank/triangles) with the *support / confidence /
lift* semantics an analyst actually asks for: "which items sell
together, and is the pairing stronger than chance?".

Scale shape: one distinct-project of (basket, item), a self-equi-join
on the basket key (per-basket quadratic, bounded by basket size — TPC-H
orders hold ~4 lines regardless of SF), then hash aggregation on the
pair. No all-pairs join, no collect; the only broadcast is the 1-row
total-basket count. All derived ratios are integer fixed-point
(ppm / micro units, truncating division on non-negative operands) so
the output is engine-portable and oracle-checkable.

Overflow note: ``lift_micros`` computes ``1e6 * pair_n * n_baskets``
in BIGINT. With pair support bounded by basket-degree (small constant)
this stays far below 2^63 up to ~1e10 baskets; beyond that move the
numerator to DECIMAL(38,0) as functions/aggregates.py does for moment
sums.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def frequent_pairs(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_pair_support: int = 2,
) -> DataFrame:
    """All item pairs co-occurring in >= min_pair_support baskets.

    Returns (item_a, item_b, pair_n, n_a, n_b, n_baskets, conf_ppm,
    lift_micros) with item_a < item_b; conf_ppm = P(b|a) in parts per
    million (truncated), lift_micros = lift in micro-units (truncated).
    """
    b = (
        df.select(
            F.col(basket_col).alias("bk"), F.col(item_col).alias("it")
        )
        .filter(F.col(basket_col).isNotNull() & F.col(item_col).isNotNull())
        .distinct()
    )
    item_n = b.groupBy("it").agg(F.count(F.lit(1)).alias("n_item"))
    pairs = (
        b.alias("l")
        .join(
            b.alias("r"),
            on=[
                F.col("l.bk") == F.col("r.bk"),
                F.col("l.it") < F.col("r.it"),
            ],
        )
        .groupBy(
            F.col("l.it").alias("item_a"), F.col("r.it").alias("item_b")
        )
        .agg(F.count(F.lit(1)).alias("pair_n"))
        .filter(F.col("pair_n") >= int(min_pair_support))
    )
    totals = b.agg(F.countDistinct("bk").alias("n_baskets"))
    out = (
        pairs.join(
            item_n.select(
                F.col("it").alias("item_a"), F.col("n_item").alias("n_a")
            ),
            "item_a",
        )
        .join(
            item_n.select(
                F.col("it").alias("item_b"), F.col("n_item").alias("n_b")
            ),
            "item_b",
        )
        .crossJoin(F.broadcast(totals))
    )
    return out.select(
        "item_a",
        "item_b",
        "pair_n",
        "n_a",
        "n_b",
        "n_baskets",
        F.expr("(1000000 * pair_n) div n_a").alias("conf_ppm"),
        F.expr("(1000000 * pair_n * n_baskets) div (n_a * n_b)").alias(
            "lift_micros"
        ),
    )
