"""Targeted oracle parity check for named queries.

Usage:
    python scripts/check_queries.py /root/testdata/sf0.001 t15_chunking g02_part_pagerank

Same compare as scripts/sweep_oracle.py, restricted to the names given —
the fast loop while building a new oracle-backed query. Rows-only
queries print their row count.
"""
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "tests"))

from pyspark.sql import SparkSession

from test_oracle_parity import canon, run_oracle
import __spark_entry__ as entrymod

sf_dir = sys.argv[1]
names = sys.argv[2:]
spark = SparkSession.builder.master("local[16]").config(
    "spark.sql.shuffle.partitions", "32"
).config("spark.driver.memory", "16g").getOrCreate()
spark.sparkContext.setLogLevel("ERROR")

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()
bad = []
for name in names:
    t0 = time.perf_counter()
    try:
        sdf = QUERIES[name](spark, sf_dir).toPandas()
        if name not in ORACLES:
            print(f"{name}: rows-only rows={len(sdf)}")
            continue
        odf = run_oracle(ORACLES[name], sf_dir)
        s_cols, s_rows = canon(sdf)
        o_cols, o_rows = canon(odf)
        if s_cols != o_cols:
            bad.append(name)
            print(f"{name}: COLS MISMATCH {s_cols} != {o_cols}")
        elif len(s_rows) != len(o_rows):
            bad.append(name)
            print(f"{name}: ROWCOUNT {len(s_rows)} != {len(o_rows)}")
        else:
            mm = [x for x in zip(s_rows, o_rows) if x[0] != x[1]]
            if mm:
                bad.append(name)
                print(f"{name}: VALUE MISMATCH {mm[:1]}")
            else:
                print(f"{name}: OK rows={len(s_rows)} {time.perf_counter()-t0:.1f}s")
    except Exception as ex:
        bad.append(name)
        print(f"{name}: ERROR {repr(ex)[:500]}")
    sys.stdout.flush()
sys.exit(1 if bad else 0)
