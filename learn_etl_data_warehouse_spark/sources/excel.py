"""Excel dim ingest (SURVEY §2.1 S1; reference server.py:26-48).

Spark has no built-in Excel source. The dims are tiny (5-84 rows), so the
idiomatic move is an ingest-edge shim: pandas reads the sheet, Arrow ships
it into a DataFrame with the declared schema. At cluster scale this is
still correct — dimension ingest is a driver-side bootstrap, the resulting
DataFrame is broadcast into joins.

Import-gated: if no Excel engine (openpyxl/xlrd) is installed the adapter
raises a clear error instead of failing at import time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_excel(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    sheet_name: int | str = 0,
) -> DataFrame:
    try:
        import pandas as pd

        pdf = pd.read_excel(path, sheet_name=sheet_name)
    except ImportError as exc:  # openpyxl missing
        raise NotImplementedError(
            "Excel ingest needs an engine (openpyxl); install it or "
            "pre-convert the workbook to CSV/parquet"
        ) from exc
    if schema is not None:
        # Align column order to the declared schema before the Arrow handoff.
        pdf = pdf[[f.name for f in schema.fields]]
        return spark.createDataFrame(pdf, schema=schema)
    return spark.createDataFrame(pdf)
