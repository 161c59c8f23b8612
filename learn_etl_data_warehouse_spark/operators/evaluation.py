"""Model-evaluation operators: ranking quality (AUC) as exact integer
arithmetic.

Reference analog: the reference pipeline ships no model-eval surface
(server.py is report aggregation), but any warehouse feeding a
classifier needs "how well does this score separate the classes"
next to the drift monitors (pf02 categorical, pf03 KS). AUC is the
standard answer, and the rank-sum (Mann–Whitney U) formulation makes
it computable exactly — no float CDFs, no trapezoids:

    AUC = [ Σ_s np_s · (2·cum_nn_below(s) + nn_s) ] / (2·n_pos·n_neg)

per distinct score s with np_s positives and nn_s negatives — each
(pos, neg) pair counts 2 if pos scores higher, 1 on a tie, 0 otherwise,
all in DECIMAL(38,0); ONE truncating ppm division at the end, so a
DuckDB HUGEINT twin agrees exactly (the pf03 determinism pattern).

Scale shape: one hash agg to (score, np, nn) — the CDF grid, bounded by
distinct score values, not row count — then one ordered window over
that grid and a final single-row agg. Same single-ordered-partition
caveat as ``profiling.ks_drift``: fine to ~1e7-1e8 distinct scores;
beyond that, swap the window for the d14 per-shard-offset prefix sum.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def auc_ranking(
    df: DataFrame,
    label: Column,
    score: Column,
) -> DataFrame:
    """Exact AUC of integer ``score`` ranking boolean ``label``.

    Returns one row ``(n_pos, n_neg, n_scores, auc_ppm)`` where
    ``auc_ppm = (1e6 · 2U) div (2·n_pos·n_neg)`` with the ties-averaged
    rank statistic 2U kept integral throughout (ties contribute 1 per
    pair instead of the float 0.5).
    """
    per_score = (
        df.select(label.cast("boolean").alias("_y"), score.alias("_s"))
        .filter(F.col("_y").isNotNull() & F.col("_s").isNotNull())
        .groupBy("_s")
        .agg(
            F.sum(F.col("_y").cast("long")).alias("_np"),
            F.sum((~F.col("_y")).cast("long")).alias("_nn"),
        )
    )
    w = Window.orderBy("_s").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    contrib = per_score.select(
        "_np",
        "_nn",
        (F.sum("_nn").over(w) - F.col("_nn")).alias("_below"),
    ).select(
        "_np",
        "_nn",
        (
            F.col("_np").cast("decimal(38,0)")
            * (2 * F.col("_below") + F.col("_nn")).cast("decimal(38,0)")
        ).alias("_pair2"),
    )
    return contrib.agg(
        F.sum("_np").cast("long").alias("n_pos"),
        F.sum("_nn").cast("long").alias("n_neg"),
        F.count(F.lit(1)).alias("n_scores"),
        F.expr(
            # a single-class input has zero (pos, neg) pairs — AUC is
            # undefined, so emit NULL instead of an ANSI divide-by-zero
            "CASE WHEN sum(_np) = 0 OR sum(_nn) = 0 THEN NULL ELSE"
            " CAST((CAST(1000000 AS DECIMAL(38,0)) * sum(_pair2))"
            " div (CAST(2 AS DECIMAL(38,0)) * sum(_np) * sum(_nn))"
            " AS BIGINT) END"
        ).alias("auc_ppm"),
    )
