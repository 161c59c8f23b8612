#!/usr/bin/env python
"""Embeddings-table scale probe (companion to scale_probe.py, which
passes embeddings through unamplified).

Amplifies sf0.1's embeddings by factor N with genuinely-new vectors:
copy c rotates each vector's components by c positions (norm-preserving,
axis-permuted — neighbor structure changes instead of stacking exact
duplicates, the same reason scale_probe rotates document tokens) and
remaps vec_id to id·N + c so ids stay unique. Then times the
embedding-family queries through their normal ``queries()`` entries.

Per-round artifact mode (the r6 verdict's ask — scale shape tracked
like bench headliners): ``--json PROBE_r07.json`` writes one JSON
object with per-(query, factor) min-of-N seconds, the growth ratio at
the top factor, and bench.py's calibration_s so rounds are comparable
across host-speed windows. Reps are INTERLEAVED as full passes (the
bench.py shape) so a sustained host stall inflates one pass, and the
per-cell min rejects it.

Usage:
    python scripts/probe_embeddings.py [--factors 1,4,16] [--reps 2] \
        [--queries knn02_majority_label_ivf,...] [--json PROBE_r07.json]

Numbers belong in SCALE.md / PROBE_r*.json only from an idle machine.
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
from bench import _calibrate_single_core

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
# knn02/d30 are the bounded ANN/dedup production paths; km01 the
# distributed Lloyd round; d21 stays as the QUADRATIC CONTROL (its
# label-cluster form is the oracle-exact twin — super-linear growth
# here is expected and documents what the bounded paths avoid).
# cl01/cl04 (r8, the r7 verdict's ask): the classifier training loops
# ride the amplified DOCUMENTS table; cl01_one_round isolates the
# per-training-round cost so a feature-map regression stays visible
# under round-count noise.
DEFAULT_QUERIES = [
    "knn02_majority_label_ivf",
    "d30_semantic_dedup_bounded",
    "km01_lloyd_assign",
    "d21_semantic_dedup",
    "cl01_perceptron_weights",
    "cl04_sparse_perceptron",
    "cl01_one_round",
]


def _cl01_one_round(spark: SparkSession, sf_dir: str):
    """ONE perceptron training round (cl01 trains 8) — the tracked
    per-round cost the r7 verdict asked for."""
    from learn_etl_data_warehouse_spark.operators.classifier import (
        perceptron_train,
        quality_features,
    )
    from learn_etl_data_warehouse_spark.sources.parquet import load_table

    return perceptron_train(
        quality_features(load_table(spark, sf_dir, "documents"),
                         min_words=40),
        rounds=1,
    )


#: probe-only callables that aren't registry queries
EXTRA_QUERIES = {"cl01_one_round": _cl01_one_round}


def build(spark: SparkSession, factor: int, out_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    _build_documents(spark, factor, out_dir)
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


def _build_documents(
    spark: SparkSession, factor: int, out_dir: str
) -> None:
    """Amplify the documents table with scale_probe.py's token ROTATION
    (verbatim copies are true near-dups of each other — the artifact the
    first probe run crawled on) + a unique suffix token, so the
    document-riding classifier queries grow honestly in the same
    artifact as the embedding probes."""
    dst = os.path.join(out_dir, "documents.parquet")
    if os.path.exists(dst):
        return
    docs = spark.read.parquet(os.path.join(SRC, "documents.parquet"))
    copies = F.explode(
        F.array(*[F.lit(i) for i in range(factor)])
    ).alias("_c")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    k = F.pmod(F.col("_c") * 7, F.greatest(F.size(toks), F.lit(1)))
    rotated = F.concat(
        F.slice(toks, k + 1, F.size(toks) - k), F.slice(toks, 1, k)
    )
    (
        docs.select("*", copies)
        .withColumn("doc_id", F.col("doc_id") * factor + F.col("_c"))
        .withColumn(
            "text",
            F.concat(
                F.array_join(rotated, " "),
                F.lit(" uniqtok"),
                F.col("doc_id").cast("string"),
            ),
        )
        .withColumn("n_chars", F.length("text"))
        .drop("_c")
        .write.mode("overwrite")
        .parquet(dst)
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factors", default="1,4,16")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--queries", default=",".join(DEFAULT_QUERIES))
    ap.add_argument("--out", default="/tmp/emb_probe")
    ap.add_argument("--json", default=None, help="write PROBE_r*.json here")
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
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    for factor in factors:
        build(spark, factor, os.path.join(args.out, f"f{factor}"))

    cal_before = _calibrate_single_core()
    best: dict[str, dict[int, float]] = {n: {} for n in names}
    rows: dict[str, dict[int, int]] = {n: {} for n in names}
    for rep in range(args.reps):
        for factor in factors:
            fdir = os.path.join(args.out, f"f{factor}")
            for n in names:
                fn = qs.get(n) or EXTRA_QUERIES[n]
                t0 = time.monotonic()
                cnt = fn(spark, fdir).count()
                dt = round(time.monotonic() - t0, 2)
                prev = best[n].get(factor)
                best[n][factor] = dt if prev is None else min(prev, dt)
                rows[n][factor] = cnt
                print(json.dumps(
                    {"rep": rep, "factor": factor, "query": n,
                     "sec": dt, "rows": cnt}
                ), flush=True)
    cal = round(min(cal_before, _calibrate_single_core()), 3)

    top = max(factors)
    base = min(factors)
    result = {
        "metric": "embeddings_scale_probe",
        "src": SRC,
        "factors": factors,
        "reps": args.reps,
        "calibration_s": cal,
        "queries": {
            n: {
                "times": {str(f): best[n][f] for f in factors},
                "rows": {str(f): rows[n][f] for f in factors},
                f"growth_{top}x": (
                    round(best[n][top] / best[n][base], 1)
                    if best[n].get(base) else None
                ),
            }
            for n in names
        },
    }
    print(json.dumps(result), flush=True)
    if args.json:
        with open(args.json, "w") as fh:
            json.dump(result, fh, indent=2)
            fh.write("\n")


if __name__ == "__main__":
    main()
