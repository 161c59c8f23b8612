"""Parquet catalog over the driver-generated fixture tables.

Parquet is the engine's native batch format: vectorized scan, predicate
pushdown, column pruning, min/max row-group skipping all come free from
the Spark parquet source (replaces reference ``pd.read_sql_query`` full
scans, server.py:53-56).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import TESTDATA_TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table. Schema comes from the parquet footer (it is
    authoritative — written by the driver); we intentionally do not force
    TESTDATA_SCHEMAS here so timestamp precision survives as-written.

    The events fixture has shipped in two flavors across driver rounds:
    TIMESTAMP(NANOS) (r1-r3), which Spark's parquet reader rejects
    outright, and plain microsecond timestamps without isAdjustedToUTC
    (r4+), which Spark reads as TIMESTAMP_NTZ. Both are normalized to the
    session-zone TIMESTAMP type the whole query surface was built on: the
    nanos path flips the session to read nanos as long and floor-converts
    to microseconds (the same truncation DuckDB and pandas apply), and the
    NTZ path casts under the UTC session (value-identical to DuckDB's
    naive read), so oracle comparisons stay bit-identical either way.
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name != "events":
        return spark.read.parquet(path)
    # Scope the legacy-conf flip: restore the prior value after planning the
    # scan, so an unrelated raw read of a NANOS file elsewhere still fails
    # loudly instead of silently returning bigint (order-dependent behavior).
    prior = spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", None)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    try:
        df = spark.read.parquet(path)
        # Force schema resolution while the flag is on; the parquet footer is
        # read at analysis time, so the resolved bigint type sticks to `df`
        # even after the conf is restored.
        dtypes = dict(df.dtypes)
    finally:
        if prior is None:
            spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
        else:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", prior)
    if dtypes.get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif dtypes.get("ts") == "timestamp_ntz":
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, names: list[str] | None = None
) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TESTDATA_TABLES)}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for the SQL surface."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
