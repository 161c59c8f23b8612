#!/usr/bin/env python
"""Embeddings-table scale probe (companion to scale_probe.py, which
passes embeddings through unamplified).

Amplifies sf0.1's embeddings by factor N with genuinely-new vectors:
copy c rotates each vector's components by c positions (norm-preserving,
axis-permuted — neighbor structure changes instead of stacking exact
duplicates, the same reason scale_probe rotates document tokens) and
remaps vec_id to id·N + c so ids stay unique. Then times the
embedding-family queries through their normal ``queries()`` entries.

Usage:
    python scripts/probe_embeddings.py [--factors 1,4,16] \
        [--queries knn02_majority_label_ivf,d30_semantic_dedup_bounded]

Numbers belong in SCALE.md only from an idle machine.
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
DEFAULT_QUERIES = [
    "knn02_majority_label_ivf",
    "d30_semantic_dedup_bounded",
    "d21_semantic_dedup",
    "km01_lloyd_assign",
]


def build(spark: SparkSession, factor: int, out_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    dst = os.path.join(out_dir, "embeddings.parquet")
    if os.path.exists(dst):
        return
    emb = spark.read.parquet(os.path.join(SRC, "embeddings.parquet"))
    dim = len(emb.select("embedding").first()["embedding"])
    copies = []
    for c in range(factor):
        rot = F.concat(
            F.slice(F.col("embedding"), c % dim + 1, dim - c % dim),
            F.slice(F.col("embedding"), 1, c % dim),
        )
        copies.append(
            emb.select(
                (F.col("vec_id") * factor + c).alias("vec_id"),
                rot.alias("embedding"),
                "label",
            )
        )
    df = copies[0]
    for other in copies[1:]:
        df = df.unionAll(other)
    df.repartition(8).write.mode("overwrite").parquet(dst)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factors", default="1,4,16")
    ap.add_argument("--queries", default=",".join(DEFAULT_QUERIES))
    ap.add_argument("--out", default="/tmp/emb_probe")
    ap.add_argument("--fresh", action="store_true")
    args = ap.parse_args()
    factors = [int(x) for x in args.factors.split(",")]
    names = [x for x in args.queries.split(",") if x]
    if args.fresh and os.path.exists(args.out):
        shutil.rmtree(args.out)

    spark = (
        SparkSession.builder.master(f"local[{os.cpu_count()}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    qs = entrymod.queries()
    results: dict[str, dict[int, float]] = {n: {} for n in names}
    for factor in factors:
        fdir = os.path.join(args.out, f"f{factor}")
        build(spark, factor, fdir)
        for n in names:
            t0 = time.monotonic()
            cnt = qs[n](spark, fdir).count()
            dt = round(time.monotonic() - t0, 2)
            results[n][factor] = dt
            print(json.dumps(
                {"factor": factor, "query": n, "sec": dt, "rows": cnt}
            ), flush=True)
    summary = {
        n: {
            "growth_16x": (
                round(results[n][16] / results[n][1], 1)
                if 16 in results[n] and 1 in results[n] and results[n][1] > 0
                else None
            ),
            "times": results[n],
        }
        for n in names
    }
    print(json.dumps({"summary": summary}), flush=True)


if __name__ == "__main__":
    main()
