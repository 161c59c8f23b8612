"""SCD2 (slowly-changing dimension, type 2) merge — emulated with
anti-join + union, since MERGE INTO needs a transactional table format
(Delta/Iceberg jars are not in this image; the plan shape is identical).

Dimension history model: one row per (key, version) with
``valid_from``/``valid_to`` timestamps and ``is_current``; ``valid_to``
null while open. The merge is three shuffle-free-ish branches over one
join of the open slice with the updates (the history slice passes
through untouched — at warehouse scale that is the overwhelming bulk of
the table, and it is never shuffled):

1. open rows whose attributes changed → closed (valid_to = update ts);
2. updates for changed or brand-new keys → new open versions;
3. open rows without a matching change → pass through.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def scd2_init(snapshot: DataFrame, key: str, ts) -> DataFrame:
    """Bootstrap a history table from a first snapshot."""
    return snapshot.select(
        "*",
        F.lit(ts).cast("timestamp").alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )


def scd2_merge(
    history: DataFrame,
    updates: DataFrame,
    key: str,
    attrs: list[str],
    ts,
) -> DataFrame:
    """Apply an update batch effective at ``ts``; returns the new history.

    ``updates`` carries (key, attrs). Unchanged updates are no-ops; new
    keys open their first version."""
    ts_lit = F.lit(ts).cast("timestamp")
    closed_hist = history.filter(~F.col("is_current"))
    open_rows = history.filter(F.col("is_current"))

    upd = updates.select(
        F.col(key).alias("_uk"), *[F.col(a).alias(f"_u_{a}") for a in attrs]
    )
    joined = open_rows.join(upd, open_rows[key] == F.col("_uk"), "left")
    # eqNullSafe: plain equality yields NULL for a null<->value transition,
    # which would drop the row from the 'changed' branch AND leave the stale
    # open version in 'untouched' — the update silently vanishes.
    changed_pred = F.col("_uk").isNotNull() & reduce(
        lambda a, b: a | b,
        [~F.col(a).eqNullSafe(F.col(f"_u_{a}")) for a in attrs],
    )
    hist_cols = history.columns
    # 1. close changed versions
    closed_now = (
        joined.filter(changed_pred)
        .select(*hist_cols)
        .withColumn("valid_to", ts_lit)
        .withColumn("is_current", F.lit(False))
    )
    # 3. untouched open rows (no update, or update equals current attrs)
    untouched = joined.filter(~F.coalesce(changed_pred, F.lit(False))).select(*hist_cols)
    # 2. new versions: updates whose key is brand-new or whose attrs changed
    changed_keys = joined.filter(changed_pred).select(F.col(key).alias("_ck"))
    new_keys = upd.join(open_rows, F.col("_uk") == open_rows[key], "left_anti")
    new_versions_src = upd.join(
        changed_keys, F.col("_uk") == F.col("_ck"), "left_semi"
    ).unionByName(new_keys)
    non_attr = [c for c in hist_cols if c not in attrs and c not in (key, "valid_from", "valid_to", "is_current")]
    new_versions = new_versions_src.select(
        F.col("_uk").alias(key),
        *[F.col(f"_u_{a}").alias(a) for a in attrs],
    )
    for c in non_attr:
        new_versions = new_versions.withColumn(c, F.lit(None).cast(history.schema[c].dataType))
    new_versions = (
        new_versions.withColumn("valid_from", ts_lit)
        .withColumn("valid_to", F.lit(None).cast("timestamp"))
        .withColumn("is_current", F.lit(True))
        .select(*hist_cols)
    )
    return closed_hist.unionByName(closed_now).unionByName(untouched).unionByName(
        new_versions
    )
