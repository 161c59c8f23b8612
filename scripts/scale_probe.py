#!/usr/bin/env python
"""Scale-growth probe: measure how the headline operators' wall-clock
grows when the data grows, beyond the fixed-corpus bench's stage-
overhead floor.

Builds amplified copies of the sf0.1 tables (factor N ∈ {1, 4, 16} by
default) with keys remapped so cardinalities genuinely grow (doc/event/
order ids stay unique; each document copy gets one unique suffix token
so amplification doesn't manufacture exact duplicates; each event copy
shifts by an hour so the timeline extends instead of stacking), then
times a representative query set through the normal ``queries()``
entries — same code path the driver grades.

Usage:
    python scripts/scale_probe.py [--factors 1,4,16] [--out /tmp/scale_probe]

Prints one JSON line per (factor, query) and a final summary JSON with
the growth ratio per query (t_16x / t_1x when both present). Numbers
belong in SCALE.md only from an idle machine.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

import __spark_entry__ as entrymod

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# tables copied as-is (dims / fixed-size inputs)
PASSTHROUGH = [
    "region", "nation", "customer", "supplier", "part", "embeddings"
]

QUERIES = [
    "q01_pricing_summary",          # lineitem scan + agg
    "q03_shipping_priority",        # 3-way join
    "w01_running_total",            # window over orders
    "e01_tumbling_window",          # event-time windows
    "e03_session_windows",          # gaps-and-islands
    "e09_hourly_gapfill",           # spine join + ffill
    "d01_dedup_exact",              # hash dedup
    "d02_ngram_jaccard_pairs",      # inverted index
    "d13_edit_distance_pairs",      # blocked levenshtein
    "d17_hot_span_scrub",           # span df + rebuild
    "t10_tfidf_top_terms",          # two-level agg
    "t14_vocab_build",              # explode + top-k
    "d16_corpus_build",             # chained pipeline
]


def amplify(spark: SparkSession, out_dir: str, n: int) -> None:
    os.makedirs(out_dir, exist_ok=True)
    copies = F.explode(F.array(*[F.lit(i) for i in range(n)])).alias("_c")

    def write(df, name):
        df.write.mode("overwrite").parquet(os.path.join(out_dir, f"{name}.parquet"))

    for name in PASSTHROUGH:
        src = os.path.join(SRC, f"{name}.parquet")
        dst = os.path.join(out_dir, f"{name}.parquet")
        if os.path.isfile(src):
            shutil.copyfile(src, dst)
        else:
            shutil.copytree(src, dst, dirs_exist_ok=True)

    docs = spark.read.parquet(os.path.join(SRC, "documents.parquet"))
    # Rotate each copy's token order by a copy-dependent offset: token
    # COUNTS (and so df/tf/vocab statistics) are preserved, but n-gram /
    # span / prefix content differs across copies — verbatim copies
    # would be true near-duplicates of each other, handing the pair
    # operators a quadratically denser true-positive set than organic
    # growth ever would (measured: the first probe crawled on exactly
    # that artifact). A unique suffix token still breaks exact dedup.
    toks = F.split(F.trim(F.col("text")), r"\s+")
    k = F.pmod(F.col("_c") * 7, F.greatest(F.size(toks), F.lit(1)))
    rotated = F.concat(
        F.slice(toks, k + 1, F.size(toks) - k), F.slice(toks, 1, k)
    )
    write(
        docs.select("*", copies)
        .withColumn("doc_id", F.col("doc_id") * n + F.col("_c"))
        .withColumn(
            "text",
            F.concat(
                F.array_join(rotated, " "),
                F.lit(" uniqtok"),
                F.col("doc_id").cast("string"),
            ),
        )
        .withColumn("n_chars", F.length("text"))
        .drop("_c"),
        "documents",
    )

    ev = spark.read.parquet(os.path.join(SRC, "events.parquet"))
    write(
        ev.select("*", copies)
        .withColumn("event_id", F.col("event_id") * n + F.col("_c"))
        .withColumn("user_id", F.col("user_id") * n + F.col("_c"))
        .withColumn(
            "ts", F.col("ts") + F.make_interval(hours=F.col("_c"))
        )
        .drop("_c"),
        "events",
    )

    orders = spark.read.parquet(os.path.join(SRC, "orders.parquet"))
    write(
        orders.select("*", copies)
        .withColumn("o_orderkey", F.col("o_orderkey") * n + F.col("_c"))
        .drop("_c"),
        "orders",
    )
    li = spark.read.parquet(os.path.join(SRC, "lineitem.parquet"))
    write(
        li.select("*", copies)
        .withColumn("l_orderkey", F.col("l_orderkey") * n + F.col("_c"))
        .drop("_c"),
        "lineitem",
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factors", default="1,4,16")
    ap.add_argument("--out", default="/tmp/scale_probe")
    ap.add_argument("--repeat", type=int, default=2)
    ap.add_argument(
        "--queries",
        default=None,
        help="comma-separated queries() names (default: built-in set)",
    )
    args = ap.parse_args()
    factors = [int(x) for x in args.factors.split(",")]
    probe_queries = (
        args.queries.split(",") if args.queries else QUERIES
    )

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.driver.memory", "48g")
        .config("spark.sql.files.maxPartitionBytes", "4m")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.queries()

    results: dict[str, dict[int, float]] = {q: {} for q in probe_queries}
    for n in factors:
        sf_dir = os.path.join(args.out, f"x{n}")
        amplify(spark, sf_dir, n)
        for q in probe_queries:
            best = float("inf")
            for _ in range(args.repeat):
                t0 = time.perf_counter()
                queries[q](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                best = min(best, time.perf_counter() - t0)
            results[q][n] = round(best, 3)
            print(json.dumps({"factor": n, "query": q, "sec": results[q][n]}))
            sys.stdout.flush()

    lo, hi = min(factors), max(factors)
    summary = {
        q: {
            "by_factor": v,
            "growth": round(v[hi] / v[lo], 2) if lo in v and hi in v else None,
        }
        for q, v in results.items()
    }
    print(json.dumps({"data_growth": hi / lo, "summary": summary}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
