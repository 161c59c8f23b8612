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

    The events fixture stores TIMESTAMP(NANOS), which Spark's parquet
    reader rejects outright. We flip the session to read nanos as long and
    floor-convert to microsecond timestamps — the same truncation DuckDB
    and pandas apply, so oracle comparisons stay bit-identical.
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name != "events":
        return spark.read.parquet(path)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    if dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, names: list[str] | None = None
) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TESTDATA_TABLES)}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for the SQL surface."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
