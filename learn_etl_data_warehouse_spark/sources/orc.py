"""ORC source/sink — the second columnar interchange format next to
parquet (SURVEY §2.1 source breadth; reference analog: the sqlite/excel
extract surface of server.py:39-56, generalized to the columnar formats
a lake actually exchanges).

Spark's ORC support is built in (no external jar) and carries the same
scan-side machinery as parquet: vectorized reader, predicate pushdown
into stripe/row-group min-max indexes, column pruning, and
partition-directory pruning for ``partitionBy`` layouts — so an ORC
landing zone plugs into every operator in this engine with the same
plan shapes as the parquet fixtures. Zstd compression is requested
per-write (not via session conf) so the sink is self-contained.

Timestamps: both session-zone TIMESTAMP and TIMESTAMP_NTZ round-trip
type- and value-exactly through Spark 4's ORC reader/writer (probed in
``tests/test_sinks.py::test_orc_timestamp_roundtrip``), so the fixture
tables' NTZ date columns flow through unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_orc(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as zstd-compressed ORC, optionally Hive-partitioned.

    Partition columns become directory keys (pruned at scan time by
    partition filters, exactly like the parquet warehouse layout in
    ``plans/warehouse.py``).
    """
    w = df.write.mode(mode).option("compression", "zstd")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """Read an ORC dataset (schema from file footers; partition columns
    are discovered from the directory layout)."""
    return spark.read.orc(path)
