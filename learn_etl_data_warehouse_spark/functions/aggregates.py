"""Deterministic aggregate helpers.

Floating-point sums are order-dependent, and Spark's partial aggregation
sums partitions in nondeterministic order — two runs (or two engines) can
disagree in the last ulp, which matters the moment the result is rounded
at a boundary (observed: a revenue sum landing on x.795 rounding to .79
in one engine and .80 in the other).

``fixed_point_sum`` removes the nondeterminism for decimal-valued
measures (money, quantities): round each term to a fixed scale, sum exact
integers (associative, order-independent), scale back once.

A second, subtler hazard: even on IDENTICAL doubles, engines can round
differently at half boundaries — Spark rounds the exact decimal
expansion of the double (BigDecimal HALF_UP) while DuckDB rounds via
float multiply — observed live at a 6th-decimal centroid boundary
(0.0032135). The cure is to perform the FINAL rounding in integer
space too: divide exact integers so any half boundary lands on an
exactly-representable binary value (m.5 with small m), where both
algorithms agree. ``fixed_point_sum`` and ``fixed_point_avg`` below do
this; the oracle SQL mirrors the same arithmetic.

Magnitude precondition (documented, generous): intermediate integers
must stay below 2^53 so the double arithmetic on them is exact —
≈ 9e15, i.e. sums up to ~90 trillion cents. Beyond that, switch the
helpers to DecimalType.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _half_up_div(num: Column, den: Column | int) -> Column:
    """Exact round-half-away-from-zero of integer ``num / den``
    (den a positive integer column or literal), computed with floor on
    exactly representable doubles: floor((2|n| + d) / (2d)), sign
    restored."""
    d = F.lit(den).cast("long") if isinstance(den, int) else den
    mag = F.floor((2 * F.abs(num) + d) / (2 * d)).cast("long")
    return F.when(num < 0, -mag).otherwise(mag)


def _wide_half_up(s: Column, f: int) -> Column:
    """Round-half-away-from-zero of DECIMAL(38,0) ``s / f`` with NO
    float anywhere: q = |s| div f (Spark's `div` on DECIMAL operands is
    exact integer division returning BIGINT; `F.call_function` reaches
    it), remainder r = |s| pmod f, round up when 2r >= f. Only the
    remainder (< f) is ever doubled — never the accumulator — so the
    full DECIMAL(38,0) range survives AGGREGATION; the earlier
    (2|s| + f) div 2f form gave up half of it to the doubling.

    The OUTPUT is bounded by the BIGINT quotient at 2⁶³ scaled units,
    and that bound needs an explicit guard: Spark 4's decimal
    `div`-to-long silently WRAPS past 2⁶³ even under ANSI mode (probed:
    8×10³⁵ div 100 returns 6646327062946643968, no throw), so an
    unguarded quotient overflow would be a silent wrong answer, not an
    error. Out-of-range sums raise_error instead."""
    fa = F.lit(f).cast("decimal(38,0)")
    a = F.abs(s)
    q = F.call_function("div", a, fa)
    r = F.call_function("pmod", a, fa)
    mag = q + F.when(r * 2 >= fa, F.lit(1)).otherwise(F.lit(0)).cast("long")
    # Guard at the smallest |s| whose ROUNDED quotient reaches 2^63:
    # f*(2^63-1) + ceil(f/2) = f*2^63 - floor(f/2). Guarding at f*2^63
    # alone would let the half-up increment push q from 2^63-1 to 2^63
    # and surface as a generic ANSI long-overflow instead of this
    # message (r12 ADVICE).
    bound = F.lit(str(f * (1 << 63) - f // 2)).cast("decimal(38,0)")
    mag = F.when(
        a >= bound,
        F.call_function(
            "raise_error",
            F.lit(
                "fixed_point_sum(wide=True): |sum| exceeds the"
                " representable output range (2^63 scaled units) —"
                " Spark's decimal div-to-long would wrap silently here"
            ),
        ).cast("long"),
    ).otherwise(mag)
    return F.when(s < 0, -mag).otherwise(mag)


def fixed_point_sum(
    col: Column, scale: int = 10_000, round_to: int = 2, wide: bool = False
) -> Column:
    """Order-independent, engine-exact sum of a decimal-valued double
    column, reported at ``round_to`` decimals.

    ``wide=True`` is the 100 TB accumulator: the default BIGINT sum has
    per-GROUP headroom 2⁶³/(|value|·scale) rows — ~6×10⁹ rows/group for
    TPC-H prices at the default scale (≈ SF1000 for q01's four groups),
    past which ANSI mode THROWS — and `_half_up_div`'s double floor is
    exact only while 2·|sum| < 2⁵³. The wide path accumulates in
    DECIMAL(38,0) (10³⁸ headroom) and rounds with a PURE-INTEGER
    half-up — (2|s| + f) div (2f), Spark DECIMAL div returns BIGINT —
    so it never touches a float until the final output conversion.
    Identical to the narrow path wherever both are in range
    (conformance-pinned); the narrow path stays the default because
    every oracle hash was earned on it and long sums are the cheaper
    hot path at test scale. Flip ``wide`` per call site when a
    deployment's group volume approaches the bound — output values
    (and oracles) are unchanged."""
    out_scale = 10**round_to
    f = scale // out_scale
    if wide:
        s = F.sum(F.round(col * scale).cast("decimal(38,0)"))
        if f <= 1:
            return F.round(s.cast("double") / F.lit(scale), round_to)
        return _wide_half_up(s, f).cast("double") / F.lit(out_scale)
    s = F.sum(F.round(col * scale).cast("long"))
    if f <= 1:
        # the integer sum is already at (or finer than) the output scale
        return F.round(s.cast("double") / F.lit(scale), round_to)
    # integer rounding to the output scale, then one exact scale-back
    return _half_up_div(s, f).cast("double") / F.lit(out_scale)


def fixed_point_avg(
    col: Column, scale: int = 100, round_to: int = 4
) -> Column:
    """Order-independent, engine-exact average: round-half-up of
    (sum_scaled * 10^round_to) / (scale * count) in integer space, then
    one exact scale-back. Avoids the cross-engine half-boundary
    divergence a float division + round would reintroduce."""
    s = F.sum(F.round(col * scale).cast("long"))
    n = F.count(F.lit(1))
    out_scale = 10**round_to
    num = s * F.lit(out_scale)
    den = F.lit(scale).cast("long") * n
    return _half_up_div(num, den).cast("double") / F.lit(out_scale)


def exact_percentiles_selection(
    df, value_col: str, qs: tuple[int, ...] = (50, 95, 99)
):
    """EXACT nearest-rank percentiles of a non-negative integer column
    with NO global sort/window — the two-scan distributed selection:

    1. rows bucket by (digit_count, 2-digit prefix) — the a26 value-
       ordered bucketing, ≤ ~1.1k buckets at any size — and one small
       agg counts each bucket; the bucket CDF locates, per q, the
       bucket containing global rank ``ceil(q·n/100)``;
    2. ONLY the target buckets' rows are re-aggregated per distinct
       VALUE (a hash agg, still no row-level ordering) and the
       within-bucket value CDF — a window over the bucket's DISTINCT
       values — names the exact answer.

    The classic formulation (`a11`, `a20`) ranks every row in one
    total order: a single partition holding the table. Here the only
    ordered frames are the bucket list and one bucket's distinct
    values. Equal-value mass is free (it collapses in the hash agg);
    the residual skew case — one bucket holding many DISTINCT values —
    is bounded by the 2-digit bucket width (one decade/10) of the
    value domain, not by row count.

    Returns a 1-row DataFrame (p{q} BIGINT per q). Engine-exact: pure
    integer ranks (ceil via (q·n + 99) div 100), so a SQL oracle using
    global nearest-rank agrees.
    """
    from pyspark.sql import Window

    v = F.col(value_col).cast("long")
    s = v.cast("string")
    bucketed = df.select(
        v.alias("_v"), F.length(s).alias("_dc"),
        F.substring(s, 1, 2).cast("int").alias("_p2"),
    )
    border = Window.orderBy("_dc", "_p2")
    counts = (
        bucketed.groupBy("_dc", "_p2")
        .agg(F.count(F.lit(1)).alias("_bn"))
        .withColumn(
            "_cum",
            F.sum("_bn").over(
                border.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .withColumn(
            "_below",
            F.col("_cum") - F.col("_bn"),
        )
        .withColumn(
            "_n",
            F.sum("_bn").over(
                Window.partitionBy().rowsBetween(
                    Window.unboundedPreceding, Window.unboundedFollowing
                )
            ),
        )
    )
    # per q: the unique bucket where the target rank lands
    targets = counts.select(
        "_dc", "_p2", "_below", "_n",
        F.col("_cum"),
        *[
            (
                (F.expr(f"({q} * _n + 99) div 100") > F.col("_below"))
                & (F.expr(f"({q} * _n + 99) div 100") <= F.col("_cum"))
            ).alias(f"_is_q{q}")
            for q in qs
        ],
    )
    hosts_a_target = targets[f"_is_q{qs[0]}"]
    for q in qs[1:]:
        hosts_a_target = hosts_a_target | targets[f"_is_q{q}"]
    targets = targets.filter(hosts_a_target)
    refined = bucketed.join(
        F.broadcast(targets), ["_dc", "_p2"]
    ).groupBy(
        "_dc", "_p2", "_below", "_n",
        *[f"_is_q{q}" for q in qs],
        F.col("_v"),
    ).agg(F.count(F.lit(1)).alias("_vn"))
    in_bucket = Window.partitionBy("_dc", "_p2").orderBy("_v")
    refined = refined.withColumn(
        "_vcum",
        F.col("_below")
        + F.sum("_vn").over(
            in_bucket.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    aggs = [
        F.min(
            F.when(
                F.col(f"_is_q{q}")
                & (F.col("_vcum") >= F.expr(f"({q} * _n + 99) div 100")),
                F.col("_v"),
            )
        ).alias(f"p{q}")
        for q in qs
    ]
    return refined.groupBy().agg(*aggs)
