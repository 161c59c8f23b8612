"""Multi-dimensional file layout: Z-order clustering for data skipping.

A single-column sort gives perfect min/max pruning on that column and
none on any other. Interleaving the bits of k scaled columns (Morton /
Z-order, the Delta/Iceberg `OPTIMIZE ZORDER BY` idea) gives every
clustered column *partial* locality, so a reader filtering on ANY subset
of them skips most files via the per-file min/max stats the parquet
footer (and the manifest warehouse's `read_snapshot(prune=...)`) already
track. At 100 TB the win is the difference between scanning one
dimension's worth of files and scanning everything for the second
predicate.

Mechanics, all engine-native and deterministic:

1. one tiny agg job fetches each column's (min, max) — 2k scalars to the
   driver, nothing else;
2. each value linear-scales to a ``bits``-wide integer (floor; nulls →
   0, so they cluster together at the low end — document, don't hide);
3. bits interleave into the z-value as a pure Column expression (k·bits
   shift/or terms, codegen'd);
4. ``repartitionByRange(n_files, z)`` + ``sortWithinPartitions(z)``
   makes each output file a contiguous z-range → tight min/max on every
   clustered column.

Linear scaling assumes roughly uniform value spread; heavily skewed
columns want a rank/percentile scale first (the same caveat Delta's
OPTIMIZE docs carry). The point here is the LAYOUT contract, which the
skipping test pins: for a 2-dim predicate the z-ordered layout must
touch strictly fewer files than a 1-dim sort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _scaled(col: Column, lo: float, hi: float, bits: int) -> Column:
    """Linear-scale to [0, 2^bits) as a long; degenerate range → 0."""
    span = hi - lo
    if span <= 0:
        return F.lit(0).cast("long")
    top = (1 << bits) - 1
    x = (col.cast("double") - F.lit(float(lo))) / F.lit(float(span))
    scaled = F.floor(x * top).cast("long")
    return F.coalesce(
        F.greatest(F.lit(0).cast("long"), F.least(scaled, F.lit(top).cast("long"))),
        F.lit(0).cast("long"),
    )


def zorder_key(
    df: DataFrame, cols: list[str], bits: int = 16
) -> tuple[DataFrame, str]:
    """Attach the interleaved z-value column ``_z`` for ``cols``.

    One driver-side (min, max) per column; the interleave itself is a
    single codegen'd expression — no shuffle, no UDF. Returns
    ``(df_with_z, "_z")``."""
    if not cols:
        raise ValueError("zorder_key needs at least one column")
    if len(cols) * bits > 63:
        raise ValueError(
            f"{len(cols)} cols × {bits} bits exceeds a signed long; "
            "lower bits"
        )
    stats = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"_lo_{i}") for i, c in enumerate(cols)],
        *[F.max(F.col(c).cast("double")).alias(f"_hi_{i}") for i, c in enumerate(cols)],
    ).collect()[0]
    z = F.lit(0).cast("long")
    k = len(cols)
    for i, c in enumerate(cols):
        lo, hi = stats[f"_lo_{i}"], stats[f"_hi_{i}"]
        if lo is None or hi is None:  # all-null column contributes 0
            continue
        s = _scaled(F.col(c), lo, hi, bits)
        for b in range(bits):
            bit = F.shiftright(s, b).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(
                F.shiftleft(bit, b * k + i)
            )
    return df.withColumn("_z", z), "_z"


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int = 16,
    bits: int = 16,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as ``n_files`` parquet files, each a contiguous
    z-range over ``cols`` — the OPTIMIZE-ZORDER layout. Range
    partitioning samples the z distribution, so files are balanced even
    when the z space is unevenly populated."""
    zdf, zc = zorder_key(df, cols, bits)
    (
        zdf.repartitionByRange(n_files, F.col(zc))
        .sortWithinPartitions(zc)
        .drop(zc)
        .write.mode(mode)
        .parquet(path)
    )


def files_touched(
    spark, path: str, predicates: dict[str, tuple[float, float]]
) -> tuple[int, int]:
    """Data-skipping probe: (files whose [min,max] overlaps EVERY
    predicate range, total files) — read from parquet footers only, the
    same stats `read_snapshot(prune=...)` and any lakehouse reader use.
    A file survives only if every predicated column's range overlaps."""
    import pyarrow.parquet as pq
    import os

    total = 0
    touched = 0
    for name in sorted(os.listdir(path)):
        if not name.endswith(".parquet"):
            continue
        total += 1
        md = pq.ParquetFile(os.path.join(path, name)).metadata
        mins: dict[str, float] = {}
        maxs: dict[str, float] = {}
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for ci in range(g.num_columns):
                col = g.column(ci)
                cname = col.path_in_schema
                if cname in predicates and col.statistics is not None:
                    st = col.statistics
                    mins[cname] = min(mins.get(cname, st.min), st.min)
                    maxs[cname] = max(maxs.get(cname, st.max), st.max)
        overlap = all(
            cname in mins and not (maxs[cname] < lo or mins[cname] > hi)
            for cname, (lo, hi) in predicates.items()
        )
        if overlap:
            touched += 1
    return touched, total


def _rank_scaled(col: Column, bounds: list[float], bits: int) -> Column:
    """Bucket index via the precomputed quantile boundaries: the count of
    boundaries ≤ value (a JVM-side filter over a literal array — 2^bits
    comparisons per row, no join, no window). Nulls → 0."""
    arr = F.array(*[F.lit(float(b)) for b in bounds])
    idx = F.size(F.filter(arr, lambda b: b <= col.cast("double")))
    top = (1 << bits) - 1
    return F.coalesce(
        F.least(idx.cast("long"), F.lit(top).cast("long")), F.lit(0).cast("long")
    )


def zorder_key_ranked(
    df: DataFrame, cols: list[str], bits: int = 8
) -> tuple[DataFrame, str]:
    """Skew-robust variant of :func:`zorder_key`: scale each column by
    its RANK (approx-quantile bucket) instead of linearly, so a column
    where 99% of values share one narrow range still spreads across the
    full 2^bits space — the fix for the linear-scale caveat, same as
    Delta's OPTIMIZE uses range-partitioned rank internally.

    Cost model at 100 TB: ONE pass computing 2^bits approximate quantile
    boundaries per column (percentile_approx — mergeable GK sketches, no
    sort), then a narrow map; vs the global sort a percent_rank window
    would need. ``bits`` ≤ 8 keeps the boundary arrays codegen-friendly
    (256 literals/column)."""
    if not cols:
        raise ValueError("zorder_key_ranked needs at least one column")
    if len(cols) * bits > 63:
        raise ValueError("cols × bits exceeds a signed long; lower bits")
    n_b = (1 << bits) - 1
    qs = [(i + 1) / (n_b + 1) for i in range(n_b)]
    aggs = []
    for i, c in enumerate(cols):
        aggs.append(
            F.percentile_approx(
                F.col(c).cast("double"), qs, 10_000
            ).alias(f"_q_{i}")
        )
    row = df.agg(*aggs).collect()[0]
    z = F.lit(0).cast("long")
    k = len(cols)
    for i, c in enumerate(cols):
        bounds = row[f"_q_{i}"]
        if bounds is None:
            continue
        s = _rank_scaled(F.col(c), list(bounds), bits)
        for b in range(bits):
            bit = F.shiftright(s, b).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, b * k + i))
    return df.withColumn("_z", z), "_z"
