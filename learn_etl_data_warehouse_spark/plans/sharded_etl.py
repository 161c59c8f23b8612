"""Per-shard parallel ojol ETL — reference EP1 (server.py:26-56) at
fleet scale.

The reference ingests ONE Excel workbook per run. A real deployment
lands one raw export per city/day shard; at 100 TB the ingest must be a
single job over the whole landing zone, not a per-file loop. Everything
here leans on machinery Spark already parallelizes:

- the landing zone is a Hive-layout directory (``_shard=<k>/part*.csv``)
  so shard identity is a DISCOVERED PARTITION COLUMN — no per-row
  parsing, and shard filters prune at the file listing, before any read;
- one multi-file CSV scan reads every shard concurrently (one task per
  split — 10k shard files parallelize for free);
- the cleaning layer (:func:`..warehouse.clean_fact`) is narrow, so the
  whole extract+clean pipeline is a single shuffle-free stage;
- the warehouse write partitions by (shard, quarter); a late shard
  re-export is a DYNAMIC partition overwrite (only the arriving shard's
  directories rewrite — the reference's ``if_exists='replace'`` scoped
  to one shard instead of the whole table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .warehouse import clean_fact

SHARD_COL = "_shard"


def write_sharded_exports(
    raw: DataFrame, out_dir: str, n_shards: int = 8, id_col: str = "id"
) -> None:
    """Land a raw all-string fact as per-shard ``;``-dialect CSV exports
    (Hive layout: ``out_dir/_shard=<k>/part*.csv``). Shard = hash of the
    business id — deterministic, so re-exports land in the same shard.
    (Test/synthetic-scale utility; production shards arrive pre-split.)
    """
    shard = F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_shards)).cast("int")
    (
        raw.withColumn(SHARD_COL, shard)
        .repartition(F.col(SHARD_COL))
        .write.mode("overwrite")
        .partitionBy(SHARD_COL)
        .csv(out_dir, sep=";", header=True)
    )


def read_sharded_fact(spark: SparkSession, landing_dir: str) -> DataFrame:
    """One scan over every shard in the landing zone. All columns arrive
    as string (explicit typing only — SURVEY §1.2); ``_shard`` comes back
    as a discovered partition column, so ``filter(_shard = k)`` prunes
    files before any bytes are read."""
    return spark.read.csv(
        landing_dir, sep=";", header=True, inferSchema=False
    ).withColumn(SHARD_COL, F.col(SHARD_COL).cast("int"))


def build_sharded_warehouse(
    spark: SparkSession,
    landing_dir: str,
    out_dir: str,
    shards: list[int] | None = None,
) -> DataFrame:
    """Extract + clean every (or selected) shard(s) in one job and write
    the fact partitioned by (shard, quarter).

    ``shards`` scopes a backfill: the shard filter prunes the scan to the
    arriving shards' files, and dynamic partition overwrite rewrites only
    the partitions present in the job's output — other shards' data is
    untouched. ``None`` = full load (static overwrite of the whole table).
    """
    raw = read_sharded_fact(spark, landing_dir)
    if shards is not None:
        raw = raw.filter(F.col(SHARD_COL).isin(shards))
    cleaned = clean_fact(raw)
    writer = cleaned.write.partitionBy(SHARD_COL, "quarter").mode("overwrite")
    if shards is not None:
        writer = writer.option("partitionOverwriteMode", "dynamic")
    writer.parquet(f"{out_dir}/fact_by_shard_quarter")
    return cleaned
