#!/usr/bin/env python
"""List registry queries that have never had a driver CORRECTNESS row —
the input to each round's window rotation (CLAUDE.md staleness policy).

Usage: python scripts/never_checked.py
"""
import glob
import json
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import __spark_entry__ as entrymod

checked = {}
rounds = sorted(
    glob.glob(os.path.join(_REPO, "CORRECTNESS_r*.json")),
    key=lambda f: int(f.rsplit("_r", 1)[1].split(".")[0]),
)
for f in rounds:
    rnd = int(f.rsplit("_r", 1)[1].split(".")[0])
    for name in json.load(open(f)):
        checked[name] = rnd  # later rounds overwrite: freshest evidence

order = list(entrymod.queries())
oracle = set(entrymod.oracle_sql())
never = [q for q in order if q not in checked]
print(f"registry: {len(order)} queries / {len(oracle)} oracle-backed")
print(f"never driver-checked: {len(never)} "
      f"({sum(q in oracle for q in never)} oracle-backed)")
for q in never:
    print(f"  {q}{'' if q in oracle else '  [rows-only]'}")
stale = sorted(
    (q for q in order if q in checked), key=lambda q: checked[q]
)
print("\nstalest checked (first 20):")
for q in stale[:20]:
    print(f"  r{checked[q]}  {q}")
