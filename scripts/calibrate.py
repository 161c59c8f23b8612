"""Host-speed calibration probe — run next to every recorded bench.

Bench numbers in this container have shown UNIFORM 3-4x swings with
zero local load (host-level noisy neighbors / CPU frequency): a run
where every query, including pure-narrow ones, inflates by the same
factor is a slow HOST, not a regression. This probe measures a
single-core Python loop and an all-core multiprocessing version of the
same loop; record both beside any bench JSON so later rounds can
normalize before calling a per-query delta a regression.

Usage: python scripts/calibrate.py
Prints one JSON line: {"single_core_s": ..., "all_core_s": ..., "cpus": N}
"""
import json
import multiprocessing as mp
import os
import time


def _loop(n: int = 20_000_000) -> float:
    t0 = time.perf_counter()
    s = 0
    for i in range(n):
        s += i
    return time.perf_counter() - t0


if __name__ == "__main__":
    single = min(_loop() for _ in range(3))
    cpus = os.cpu_count() or 1
    with mp.Pool(cpus) as pool:
        t0 = time.perf_counter()
        pool.map(_loop, [20_000_000] * cpus)
        all_core = time.perf_counter() - t0
    print(json.dumps({
        "single_core_s": round(single, 3),
        "all_core_s": round(all_core, 3),
        "cpus": cpus,
    }))
