"""Skew-mitigation join: salting for hot keys.

AQE's skew-join splitter handles moderate skew automatically (enabled in
session.py). This operator is the explicit fallback for pathological
distributions — e.g. the reference's fact, where 931/1878 rows share the
'' merchant key: at 100 TB such a key sends half the table to one
reducer.

Salting scheme: the skewed (big) side gets a deterministic salt in
[0, n) derived from row content (xxhash64 — no RNG, plan is reproducible);
the small side is replicated n ways. The join key becomes
(key, salt), splitting each hot key across n reducers. Equivalent to the
plain join because every (key, salt) pair on the left finds exactly the
one replicated right row with that salt.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    how: str = "inner",
    salt_buckets: int = 16,
) -> DataFrame:
    """Join ``big`` to ``small`` on ``key`` with the big side salted.

    ``small`` is replicated ``salt_buckets``× (only viable when it is
    orders of magnitude smaller — the same precondition as broadcasting,
    but without the single-executor memory bound).

    Only ``inner`` and ``left`` are supported: with the small side
    replicated, right/full outer joins would emit each unmatched small
    row once per salt — silently wrong, so they are rejected.

    The salt mixes in ``monotonically_increasing_id`` so even byte-equal
    duplicate rows (the classic dirty-ingest hot key) fan out across
    buckets; which salt a row gets never affects the join result, so
    output determinism is preserved."""
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(
            f"salted_join supports inner/left only, got {how!r}: the "
            "replicated small side would duplicate unmatched rows"
        )
    salted_big = big.withColumn(
        "_salt",
        F.pmod(
            F.xxhash64(F.monotonically_increasing_id()), F.lit(salt_buckets)
        ),
    )
    replicated_small = small.withColumn(
        "_salt",
        F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)])),
    )
    out = salted_big.join(replicated_small, on=[key, "_salt"], how=how)
    return out.drop("_salt")


def auto_salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    how: str = "inner",
    share_threshold_ppm: int = 50_000,
    max_salt: int = 64,
) -> DataFrame:
    """Stats-driven skew join: MEASURE the big side's key distribution
    (pf10's audit arithmetic), route only the genuinely hot keys
    through :func:`salted_join`, and leave the rest on the plain
    shuffle — the composed form of the pf10 → j06 playbook, so a
    pipeline doesn't need a human to read the audit first.

    Hot = share > ``share_threshold_ppm``. That bound makes the hot
    set PROVABLY bounded: at threshold p ppm at most 10⁶/p keys can
    qualify (20 keys at the 5% default) — so collecting it to the
    driver and broadcasting it is metadata, never data. Salt buckets =
    the hottest key's ceil-div salt factor (pf10's number), capped at
    ``max_salt``. No hot keys → the UNMODIFIED plain join (zero added
    shuffles, explain-identical).

    Same how-restrictions as salted_join (inner/left only); the
    split-and-union is semantics-preserving because hot and cold key
    sets are disjoint, so plain-join equivalence holds row-for-row
    (conformance-tested).
    """
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(
            f"auto_salted_join supports inner/left only, got {how!r}"
        )
    c = big.groupBy(key).agg(F.count(F.lit(1)).cast("long").alias("_cnt"))
    t = c.agg(
        F.sum("_cnt").cast("long").alias("_total"),
        F.count(F.lit(1)).cast("long").alias("_nkeys"),
    ).collect()[0]
    if t["_total"] is None or t["_total"] == 0:
        return big.join(small, on=key, how=how)
    mean = max(1, t["_total"] // t["_nkeys"])
    hot = (
        c.filter(
            (F.col("_cnt") * 1_000_000)
            > F.lit(int(share_threshold_ppm)) * F.lit(int(t["_total"]))
        )
        .select(key, "_cnt")
        .collect()
    )
    # NULL is excluded from hot routing even when it dominates the
    # distribution: NULL never equi-matches, so salting it buys nothing,
    # and a None inside isin() makes the predicate NULL (not False) for
    # every cold key — both branches would then silently drop all
    # non-hot non-null rows. NULL rows ride the cold path, where the
    # `| isNull()` keeps them for left joins (inner drops them, as the
    # plain join would).
    hot = [r for r in hot if r[key] is not None]
    if not hot:
        return big.join(small, on=key, how=how)
    buckets = min(
        int(max_salt), max(2, (max(r["_cnt"] for r in hot) + mean - 1) // mean)
    )
    hot_keys = [r[key] for r in hot]
    is_hot = F.col(key).isin(hot_keys)
    cold = big.filter(~is_hot | F.col(key).isNull()).join(
        small, on=key, how=how
    )
    hot_part = salted_join(
        big.filter(is_hot), small, key, how=how, salt_buckets=buckets
    )
    return cold.unionByName(hot_part)
