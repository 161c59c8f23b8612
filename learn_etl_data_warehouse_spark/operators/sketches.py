"""Mergeable sketch state — the sublinear summaries a 100 TB pipeline
keeps when exact state would be another fact table.

Complements the native sketch surface already in the registry (HLL
``approx_count_distinct`` in a09/analyze_table, ``approx_top_k`` in
a25, KLL percentiles in a14): a Count-Min sketch is the one that
answers point-frequency queries under a hard memory bound AND merges
additively — per-partition / per-day sketches sum into the global one,
so it rides the same incremental-maintenance machinery as the counted
states (one small table, counts add).

Determinism: buckets come from ``xxhash64(value, seed=row)`` — the
engine's stable 64-bit hash (already the d11/d14 sampling primitive),
so the sketch is reproducible across runs and cluster sizes. No DuckDB
twin exists for xxhash64, so this family is conformance/property-
tested rather than oracle-backed (estimate ≥ truth always; equality
when width ≫ distinct values; merge ≡ build-on-union).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def countmin_build(
    df: DataFrame, col: str, width: int = 1024, depth: int = 4
) -> DataFrame:
    """Build a Count-Min sketch of ``col``'s value frequencies.

    ``depth`` independent hash rows (seeded xxhash64), ``width``
    buckets each — the sketch is the (row, bucket, cnt) table, at most
    depth·width rows regardless of input size. One narrow projection
    per hash row + one aggregation; the depth-way union is a plan-side
    fan-out of the same scan, not extra passes over stored data (AQE
    reuses the exchange).
    """
    if width < 1 or depth < 1:
        raise ValueError("countmin_build: width and depth must be >= 1")
    parts = [
        df.select(
            F.lit(j).alias("row"),
            F.pmod(F.xxhash64(F.col(col), F.lit(j)), F.lit(width)).alias(
                "bucket"
            ),
        )
        for j in range(depth)
    ]
    return (
        reduce(lambda a, b: a.unionByName(b), parts)
        .groupBy("row", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def countmin_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two same-shape sketches additively (counts add bucket-
    wise) — the property that lets per-shard / per-day sketches roll
    up without touching raw data."""
    return (
        a.unionByName(b)
        .groupBy("row", "bucket")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )


def countmin_estimate(
    sketch: DataFrame, keys: DataFrame, col: str, width: int = 1024
) -> DataFrame:
    """Point-frequency estimates for ``keys[col]``: min over hash rows
    of the addressed bucket counts (the CM guarantee: ≥ truth, with
    overestimate bounded by collisions). ``width`` must match the
    build. A key addressing an absent (row, bucket) cell reads 0.

    One key-side projection per hash row + a (row, bucket) equality
    join against the ≤ depth·width sketch — broadcast-sized by
    construction.
    """
    depth_rows = [r["row"] for r in sketch.select("row").distinct().collect()]
    parts = [
        keys.select(
            F.col(col).alias("key"),
            F.lit(j).alias("row"),
            F.pmod(F.xxhash64(F.col(col), F.lit(j)), F.lit(width)).alias(
                "bucket"
            ),
        )
        for j in sorted(depth_rows)
    ]
    addressed = reduce(lambda a, b: a.unionByName(b), parts)
    return (
        addressed.join(F.broadcast(sketch), ["row", "bucket"], "left")
        .groupBy("key")
        .agg(
            F.min(F.coalesce(F.col("cnt"), F.lit(0)))
            .cast("long")
            .alias("est")
        )
    )


def daily_hll_sketches(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-day HLL sketch of distinct ``key_col`` — the MERGEABLE
    distinct-count state (Spark's native Apache DataSketches HLL,
    ``hll_sketch_agg``). One sketch row per day; sketches union
    losslessly, so any window/rollup over days is a state-sized
    re-aggregation — the 100 TB answer to exact sliding distinct
    (e21's day-grain pair reduction re-scans pairs; this re-scans
    ~1 KB sketches)."""
    us_day = 86_400_000_000
    return df.groupBy(
        F.expr(f"unix_micros({ts_col}) div {us_day}")
        .cast("long")
        .alias("day")
    ).agg(F.expr(f"hll_sketch_agg({key_col})").alias("sk"))


def rolling_distinct_hll(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    window_days: int = 7,
) -> DataFrame:
    """Sliding-window distinct estimate: union the member days'
    sketches per window end and estimate — the approximate twin of the
    exact e21 query (conformance-tested within HLL error bounds).
    Rows-only by nature: the sketch binary is engine-specific.

    Returns (day, n_users_est BIGINT)."""
    daily = daily_hll_sketches(df, key_col, ts_col)
    spine = daily.select(F.col("day").alias("w_day")).distinct()
    j = daily.join(
        F.broadcast(spine),
        (F.col("day") <= F.col("w_day"))
        & (F.col("day") >= F.col("w_day") - (int(window_days) - 1)),
    )
    return (
        j.groupBy(F.col("w_day").alias("day"))
        .agg(F.expr("hll_union_agg(sk)").alias("u"))
        .select(
            "day",
            F.expr("hll_sketch_estimate(u)").cast("long").alias(
                "n_users_est"
            ),
        )
    )


def value_histogram_state(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Mergeable log-bucket value histogram at day grain — the
    percentile-dashboard state the hourly_preagg pattern can't carry
    (quantiles aren't mergeable, but BUCKET COUNTS are). Buckets are
    (digit_count, first_digit) of the non-negative integer cent value:
    ~2-significant-figure resolution, ≤ ~180 buckets for BIGINT range,
    purely integer-derived (string length + first char — no libm log),
    so any engine buckets identically. Day states merge to ANY coarser
    grain by summing counts.

    Returns (key, day BIGINT — epoch days, dc, fd, n BIGINT).
    """
    cents = F.round(F.col(value_col) * 100).cast("long")
    s = cents.cast("string")
    us_day = 86_400_000_000
    return (
        events.select(
            F.col(key_col).alias("key"),
            F.expr(f"unix_micros({ts_col}) div {us_day}")
            .cast("long")
            .alias("day"),
            F.length(s).alias("dc"),
            F.substring(s, 1, 1).cast("int").alias("fd"),
        )
        .groupBy("key", "day", "dc", "fd")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


def histogram_percentiles(
    state: DataFrame, qs: tuple[int, ...] = (50, 95, 99)
) -> DataFrame:
    """Answer p{q} per key from merged histogram states: the first
    bucket whose cumulative count covers q% of the total, reported as
    the bucket's integer lower bound (fd·10^(dc−1) cents, built by
    string repetition — no float pow). Nearest-rank on buckets via the
    pure integer predicate cum·100 ≥ q·total, so the answer is exact
    over the bucketing (±one bucket of true, i.e. ~2 significant
    figures) and engine-identical. The cumsum window is per-key over a
    BOUNDED bucket alphabet — never over rows."""
    from pyspark.sql import Window

    merged = state.groupBy("key", "dc", "fd").agg(
        F.sum("n").cast("long").alias("n")
    )
    w = (
        Window.partitionBy("key")
        .orderBy("dc", "fd")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tot = Window.partitionBy("key")
    lb = F.concat(
        F.col("fd").cast("string"), F.repeat(F.lit("0"), F.col("dc") - 1)
    ).cast("long")
    scored = merged.select(
        "key",
        lb.alias("_lb"),
        F.sum("n").over(w).alias("_cum"),
        F.sum("n").over(tot).alias("_tot"),
    )
    aggs = [
        F.min(
            F.when(F.col("_cum") * 100 >= q * F.col("_tot"), F.col("_lb"))
        ).alias(f"p{q}_cents_lb")
        for q in qs
    ]
    return scored.groupBy("key").agg(*aggs)


def md5_hll_registers(
    df: DataFrame,
    key_col: str,
    group_col,
    group_alias: str = "grp",
    m: int = 64,
) -> DataFrame:
    """Deterministic HyperLogLog register state per group — md5-derived
    (the d11/st01 portable-hash discipline), so unlike the native
    ``approx_count_distinct``/``hll_sketch_agg`` family (a09/e22,
    rows-only by nature) the whole sketch AND its estimate are
    reproducible cross-engine and therefore oracle-backable.

    Per key: 4 hex chars of ``md5(key)`` pick the register (uniform —
    16 bits divisible by ``m`` for power-of-two m), the next 6 hex
    chars give a 21-bit value ``v``; ``rho`` = leading zeros of the
    21-bit string + 1 = ``22 − length(bin(v))`` (``bin`` strips leading
    zeros identically on both engines; v = 0 pins rho = 22). Register
    state = max(rho) — MAX-MERGEABLE: sketches of disjoint batches (or
    replays of the SAME batch) fold by per-register max, which is why
    the streaming twin needs no ledger.

    One hash agg at (group, register) grain; output ≤ m rows per group.
    """
    if m & (m - 1) or m > 65536:
        raise ValueError(f"m must be a power of two <= 65536, got {m}")
    grp = F.col(group_col) if isinstance(group_col, str) else group_col
    h = F.md5(F.col(key_col).cast("string").cast("binary"))
    reg = F.conv(F.substring(h, 1, 4), 16, 10).cast("long") % m
    v = F.conv(F.substring(h, 5, 6), 16, 10).cast("long") % (1 << 21)
    rho = F.when(v == 0, F.lit(22)).otherwise(22 - F.length(F.bin(v)))
    return (
        df.select(grp.alias(group_alias), reg.alias("reg"), rho.alias("_r"))
        .groupBy(group_alias, "reg")
        .agg(F.max("_r").cast("long").alias("rho_max"))
    )


def md5_hll_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Fold two register tables: per-register MAX. Idempotent (replays
    are no-ops) and associative — the additive-state posture of the
    counted families, but under max."""
    cols = a.columns
    return (
        a.unionByName(b)
        .groupBy(*[c for c in cols if c != "rho_max"])
        .agg(F.max("rho_max").cast("long").alias("rho_max"))
    )


def md5_hll_estimate(regs: DataFrame, group_alias: str = "grp", m: int = 64):
    """Raw HLL estimate from a register table, all-integer: with S =
    Σ 2^(40−rho) over all m registers (absent registers contribute
    2^40, i.e. rho = 0), est = (alpha·m²·2^40) div (1000·S) with alpha
    the standard HLL bias constant as a per-thousand rational
    (673/697/709 for m = 16/32/64); every operand stays under 2^63 for
    m ≤ 64 — larger m would overflow and raises (move to DECIMAL(38,0)
    first). NO small-range (linear-counting) correction
    — ``n_zero_registers`` is emitted so a consumer can apply it; the
    raw estimate is what the oracle pins.
    """
    alpha_ppt = {16: 673, 32: 697, 64: 709}
    if m not in alpha_ppt:
        raise ValueError(
            f"m={m} unsupported: the BIGINT estimate constant needs"
            " m in (16, 32, 64)"
        )
    shifted = F.expr("shiftleft(CAST(1 AS BIGINT), 40 - CAST(rho_max AS INT))")
    agg = regs.groupBy(group_alias).agg(
        F.count(F.lit(1)).cast("long").alias("_n_used"),
        F.sum(shifted).cast("long").alias("_s_present"),
    )
    num = alpha_ppt[m] * m * m * (1 << 40)
    s = (
        f"(_s_present + ({m} - _n_used) * CAST({1 << 40} AS BIGINT))"
    )
    return agg.select(
        group_alias,
        (m - F.col("_n_used")).cast("long").alias("n_zero_registers"),
        F.expr(f"CAST({num} AS BIGINT) div (1000 * {s})")
        .cast("long")
        .alias("est_ndv"),
    )
