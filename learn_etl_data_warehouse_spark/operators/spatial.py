"""Spatial operators: grid-blocked radius joins on integer coordinates.

Coordinates are BIGINT micro-degrees (fixed-point, like the repo's
money-in-cents rule) so distance arithmetic is exact integer math —
dx² + dy² ≤ r² compares BIGINTs, never floats, and an external SQL
engine reproduces the pair set bit-for-bit.

Scale shape is the canonical spatial blocking: with cell size == the
search radius, any qualifying pair lies in the same or an adjacent
cell, so expanding ONE side to its 3×3 cell neighborhood and hash-
joining on the cell key bounds candidates by local density — no
all-pairs cross join at any scale. Each true pair is emitted exactly
once (the un-expanded side's cell is unique, so the pair matches on
exactly one expanded key; no distinct needed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def grid_radius_join(
    pts: DataFrame,
    radius: int,
    id_col: str = "pid",
    x_col: str = "x",
    y_col: str = "y",
) -> DataFrame:
    """All point pairs within ``radius`` (inclusive, Euclidean) of each
    other — (id_a < id_b, dist_sq). Coordinates must be non-negative
    BIGINT fixed-point units (floor(x / cell) via double division is
    exact for ints < 2⁵², and non-negativity sidesteps the truncating-
    vs-flooring division split between engines)."""
    if radius <= 0:
        raise ValueError("radius must be positive")
    cell = F.lit(radius)
    base = pts.select(
        F.col(id_col).alias("_id"),
        F.col(x_col).cast("long").alias("_x"),
        F.col(y_col).cast("long").alias("_y"),
        F.floor(F.col(x_col) / cell).alias("_cx"),
        F.floor(F.col(y_col) / cell).alias("_cy"),
    )
    offsets = F.expr(
        "explode(transform(sequence(0, 8),"
        " i -> struct(i div 3 - 1 AS dx, i % 3 - 1 AS dy)))"
    )
    expanded = pts.select(
        F.col(id_col).alias("_id2"),
        F.col(x_col).cast("long").alias("_x2"),
        F.col(y_col).cast("long").alias("_y2"),
        F.floor(F.col(x_col) / cell).alias("_ecx"),
        F.floor(F.col(y_col) / cell).alias("_ecy"),
        offsets.alias("_o"),
    ).select(
        "_id2",
        "_x2",
        "_y2",
        (F.col("_ecx") + F.col("_o.dx")).alias("_ecx"),
        (F.col("_ecy") + F.col("_o.dy")).alias("_ecy"),
    )
    dx = F.col("_x") - F.col("_x2")
    dy = F.col("_y") - F.col("_y2")
    dist_sq = dx * dx + dy * dy
    return (
        base.join(
            expanded,
            (F.col("_cx") == F.col("_ecx"))
            & (F.col("_cy") == F.col("_ecy"))
            & (F.col("_id") < F.col("_id2")),
        )
        .filter(dist_sq <= F.lit(radius) * F.lit(radius))
        .select(
            F.col("_id").alias("id_a"),
            F.col("_id2").alias("id_b"),
            dist_sq.cast("long").alias("dist_sq"),
        )
    )
