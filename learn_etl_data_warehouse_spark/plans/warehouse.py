"""The ojol warehouse pipeline — reference EP1 (server.py:26-130)
re-expressed as one declarative Spark plan.

Reference shape: extract → per-column cleaning UDF chain → drop raw cols →
TWO materializations of the same fact (dict-of-DataFrames by quarter AND by
mode) → 12 SQLite tables. Engine shape: one narrow expression chain that
pipelines into the scan (no shuffle until the write), then ONE logical
fact table written ``partitionBy('quarter')`` (and optionally by mode):
per-partition lookups become partition-pruned scans instead of physical
table-per-key (SURVEY §4 "Partition pruning" / "Double-partition
redundancy").
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.cleaning import (
    clean_sci_notation_id,
    duration_minutes,
    empty_to_null,
    get_lat,
    get_lng,
    rounded_dist,
    split_date_end,
    split_date_start,
)
from ..functions.datetime_fns import quarter_key


def clean_fact(raw: DataFrame) -> DataFrame:
    """The full cleaning/derivation layer over the all-string raw fact
    (reference server.py:59-98). Entirely narrow — zero shuffles; every
    expression is whole-stage-codegen'd.

    Column-for-column parity with the reference's cleaned fact, plus the
    ``quarter`` partition key (the reference derives it later, at
    partition time, server.py:101-102)."""
    return (
        raw.withColumn("date_start", split_date_start("date_process"))
        .withColumn("date_end", split_date_end("date_process"))
        .withColumn("from_kelurahanid", clean_sci_notation_id("from_kelurahanid"))
        .withColumn("to_kelurahanid", clean_sci_notation_id("to_kelurahanid"))
        .withColumn("from_lat", get_lat("transaction_from_latlng"))
        .withColumn("from_lng", get_lng("transaction_from_latlng"))
        .withColumn("to_lat", get_lat("transaction_to_latlng"))
        .withColumn("to_lng", get_lng("transaction_to_latlng"))
        .withColumn("distance", F.col("distance").cast("double"))
        .withColumn("distance_rounded", rounded_dist("distance"))
        .withColumn("amount_delivery", F.col("amount_delivery").cast("double"))
        .withColumn("amount_merchant", F.col("amount_merchant").cast("double"))
        .withColumn(
            "transaction_amount_total",
            F.col("transaction_amount_total").cast("double"),
        )
        .withColumn("duration", duration_minutes("date_start", "date_end"))
        .withColumn("merchant_id", empty_to_null("merchant_id"))
        .withColumn("quarter", quarter_key("date_start"))
        .drop("date_process", "transaction_from_latlng", "transaction_to_latlng")
    )


def build_ojol_warehouse(
    raw_fact: DataFrame,
    out_dir: str,
    also_by_mode: bool = False,
) -> DataFrame:
    """Materialize the warehouse: cleaned fact, partitioned by quarter
    (replace semantics, like the reference's ``if_exists='replace'``).

    ``also_by_mode`` writes the second layout the reference keeps
    (server.py:108-112); default off — one layout + min/max skipping
    usually suffices and halves storage/write cost (SURVEY §4).
    Returns the cleaned fact (lazy; caller decides to cache/read back).
    """
    cleaned = clean_fact(raw_fact)
    (
        cleaned.write.mode("overwrite")
        .partitionBy("quarter")
        .parquet(f"{out_dir}/fact_by_quarter")
    )
    if also_by_mode:
        (
            cleaned.write.mode("overwrite")
            .partitionBy("mode")
            .parquet(f"{out_dir}/fact_by_mode")
        )
    return cleaned
