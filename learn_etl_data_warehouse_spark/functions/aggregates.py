"""Deterministic aggregate helpers.

Floating-point sums are order-dependent, and Spark's partial aggregation
sums partitions in nondeterministic order — two runs (or two engines) can
disagree in the last ulp, which matters the moment the result is rounded
at a boundary (observed: a revenue sum landing on x.795 rounding to .79
in one engine and .80 in the other).

``fixed_point_sum`` removes the nondeterminism for decimal-valued
measures (money, quantities): round each term to a fixed scale, sum exact
integers (associative, order-independent), scale back once. This is the
engine's standard for every monetary aggregate; it is also how the DuckDB
oracle SQL is written, so results are bit-identical across engines and
across partitionings — a property plain ``sum(double)`` cannot give at
any scale, let alone 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def fixed_point_sum(col: Column, scale: int = 10_000, round_to: int = 2) -> Column:
    """Order-independent sum of a decimal-valued double column.

    round(term * scale) must be integral-exact in double (|term| * scale
    < 2^53) — true for money/quantity columns at any realistic magnitude.
    """
    return F.round(
        F.sum(F.round(col * scale).cast("long")).cast("double") / F.lit(scale),
        round_to,
    )


def fixed_point_avg(
    col: Column, scale: int = 100, round_to: int = 4
) -> Column:
    """Order-independent average built from the exact integer sum."""
    return F.round(
        F.sum(F.round(col * scale).cast("long")).cast("double")
        / F.lit(scale)
        / F.count(F.lit(1)),
        round_to,
    )
