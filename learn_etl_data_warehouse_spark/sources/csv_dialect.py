"""Reference CSV dialect reader (SURVEY §2.1 S3).

The reference's denormalized exports (``assets/oltp/dummy_ojol_transactions
.csv``) use ``;`` separators, ``,`` as the decimal mark, and
``dd/MM/yyyy HH.mm`` timestamps. Decimal-comma is not something the Spark
CSV source parses natively, so numeric columns are read as string and
normalized with ``regexp_replace(',', '.')`` before the cast — a narrow,
codegen'd transformation that pipelines into the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

OJOL_CSV_TS_FORMAT = "dd/MM/yyyy HH.mm"


def read_ojol_csv(
    spark: SparkSession,
    path: str,
    decimal_comma_cols: list[str] | None = None,
    timestamp_cols: list[str] | None = None,
) -> DataFrame:
    """Read a ``;``-separated reference-dialect CSV.

    All columns arrive as string (header=True, no inference — SURVEY §1.2:
    explicit typing only); ``decimal_comma_cols`` are normalized and cast
    to double, ``timestamp_cols`` parsed with the dd/MM/yyyy HH.mm pattern.
    """
    df = spark.read.csv(path, sep=";", header=True, inferSchema=False)
    for c in decimal_comma_cols or []:
        df = df.withColumn(c, F.regexp_replace(F.col(c), ",", ".").cast("double"))
    for c in timestamp_cols or []:
        df = df.withColumn(c, F.to_timestamp(F.col(c), OJOL_CSV_TS_FORMAT))
    return df
