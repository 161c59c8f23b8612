#!/usr/bin/env python
"""A/B growth probe for the d34 repeat-scrub kernels (r9 verdict item
2): the default string-shuffle path vs ``fingerprint_grams=True``
(xxhash64 fingerprints in both corpus-proportional shuffles, string
recheck on survivor docs) on the scale_probe amplified corpora.

Usage:
    python scripts/probe_repeat_fingerprint.py [--factors 1,16] \
        [--out /tmp/scale_probe] [--json PROBE_FP_rN.json]

Prints one JSON line per (factor, kernel) and a summary with growth
ratios and the fingerprint/string speedup per factor. Numbers belong
in SCALE.md only from an idle machine; calibration is embedded.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "scripts"))

from pyspark.sql import SparkSession

from calibrate import _loop
from scale_probe import amplify


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factors", default="1,16")
    ap.add_argument("--out", default="/tmp/scale_probe")
    ap.add_argument("--repeat", type=int, default=2)
    ap.add_argument("--json", default=None)
    args = ap.parse_args()
    factors = [int(x) for x in args.factors.split(",")]

    cal = min(_loop() for _ in range(2))
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

    from learn_etl_data_warehouse_spark.operators.dedup import (
        maximal_repeat_stats,
    )

    def shuffle_write_bytes() -> int:
        # cumulative shuffle write across all completed stages — diff
        # around a run to get its shuffle volume (the quantity the
        # fingerprint kernel exists to cut at 100 TB; local wall-clock
        # barely sees shuffle BYTES on an in-memory single box)
        base = spark.sparkContext.uiWebUrl
        app = spark.sparkContext.applicationId
        url = f"{base}/api/v1/applications/{app}/stages?status=COMPLETE"
        with urllib.request.urlopen(url) as r:
            stages = json.load(r)
        return sum(s.get("shuffleWriteBytes", 0) for s in stages)

    ARMS = {
        "string": dict(fingerprint_grams=False),
        "fingerprint": dict(fingerprint_grams=True),
        "hash128": dict(
            fingerprint_grams=True, fingerprint_recheck="hash128"
        ),
    }
    results: dict[str, dict[int, float]] = {k: {} for k in ARMS}
    sbytes: dict[str, dict[int, int]] = {k: {} for k in ARMS}
    for n in factors:
        sf_dir = os.path.join(args.out, f"x{n}")
        amplify(spark, sf_dir, n)
        docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        # interleaved reps so a host stall inflates one pass, not one arm
        best = {k: float("inf") for k in ARMS}
        for rep in range(args.repeat):
            for kernel, kw in ARMS.items():
                b0 = shuffle_write_bytes()
                t0 = time.perf_counter()
                maximal_repeat_stats(
                    docs, levels=(4, 8, 16), min_len=8, **kw
                ).write.format("noop").mode("overwrite").save()
                best[kernel] = min(best[kernel], time.perf_counter() - t0)
                if rep == 0:
                    sbytes[kernel][n] = shuffle_write_bytes() - b0
        for kernel in ARMS:
            results[kernel][n] = round(best[kernel], 3)
            print(json.dumps({
                "factor": n, "kernel": kernel, "sec": results[kernel][n],
                "shuffle_mb": round(sbytes[kernel][n] / 1e6, 1),
            }))
            sys.stdout.flush()

    lo, hi = min(factors), max(factors)
    summary = {
        "calibration_single_core_s": round(cal, 3),
        "data_growth": hi / lo,
        "kernels": {
            k: {
                "by_factor": v,
                "growth": round(v[hi] / v[lo], 2)
                if lo in v and hi in v
                else None,
                "shuffle_mb_by_factor": {
                    str(n): round(b / 1e6, 1) for n, b in sbytes[k].items()
                },
            }
            for k, v in results.items()
        },
        "shuffle_reduction_vs_string": {
            k: {
                str(n): round(sbytes["string"][n] / max(sbytes[k][n], 1), 2)
                for n in factors
            }
            for k in ("fingerprint", "hash128")
        },
        "speedup_vs_string": {
            k: {
                str(n): round(results["string"][n] / results[k][n], 2)
                for n in factors
            }
            for k in ("fingerprint", "hash128")
        },
    }
    line = json.dumps(summary)
    print(line)
    if args.json:
        with open(args.json, "w") as f:
            f.write(line + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
