"""Runnable tour of the warehouse layer: commit → constrain → analyze →
query with SQL → mutate → time-travel → history → vacuum.

    python examples/quickstart.py [work_dir]

Uses the sf0.001 events fixture; everything lands under work_dir
(default: a temp dir). Each step prints what it proved.
"""
import os
import sys
import tempfile

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from pyspark.sql import functions as F

from learn_etl_data_warehouse_spark.plans import catalog as cat
from learn_etl_data_warehouse_spark.plans import manifest_warehouse as mw
from learn_etl_data_warehouse_spark.session import get_spark
from learn_etl_data_warehouse_spark.sources.parquet import load_table


def main(work_dir: str) -> None:
    spark = get_spark(master="local[4]")
    spark.sparkContext.setLogLevel("ERROR")
    events = load_table(spark, "/root/testdata/sf0.001", "events")
    cdir = os.path.join(work_dir, "warehouse")

    # 1. one ATOMIC multi-table commit: fact + its hourly rollup
    hourly = events.groupBy(
        F.date_trunc("hour", "ts").alias("hour"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"),
    )
    t1 = cat.catalog_commit(
        spark,
        cdir,
        {
            "events": (events.withColumn("etype", F.col("event_type")), ["etype"]),
            "hourly": (hourly, ["event_type"]),
        },
    )
    print(f"1. committed events+hourly atomically as catalog txn {t1}")

    # 2. plain SQL over the governed snapshot
    pinned = cat.register_catalog_views(spark, cdir)
    n = spark.sql(
        """SELECT e.event_type, count(*) AS n
           FROM events e JOIN hourly h ON e.event_type = h.event_type
           GROUP BY 1 ORDER BY 1"""
    ).count()
    print(f"2. spark.sql over views pinned to {pinned}: {n} joined groups")

    # 3. statistics → broadcast advice
    table = os.path.join(cdir, "hourly")
    mw.analyze_table(spark, table)
    advice = mw.broadcast_advice(table)
    print(f"3. ANALYZE: {mw.table_stats(table)['row_count']} rows, "
          f"advice={advice['strategy']}")

    # 4. transactional DELETE + time travel back to the pre-delete state
    etable = os.path.join(cdir, "events")
    before = mw.read_snapshot(spark, etable).count()
    pre_delete = mw.read_manifest(etable)["txn"]
    mw.delete_where(spark, etable, "event_type = 'error'")
    after = mw.read_snapshot(spark, etable).count()
    old = mw.read_snapshot(spark, etable, as_of=pre_delete).count()
    print(f"4. DELETE errors: {before}→{after} rows; as_of reads {old}")

    # 5. history + vacuum
    hist = mw.table_history(etable)
    print(f"5. history: {[(h['seq'], h['n_changed_partitions']) for h in hist]}")
    removed = mw.vacuum(etable)
    print(f"   vacuum reclaimed {removed} superseded version dirs")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp())
