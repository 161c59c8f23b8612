"""Manifest-versioned warehouse — cross-partition SNAPSHOT ISOLATION
without Delta/Iceberg jars (they're absent in this image; this is the
same core idea at directory grain).

``atomic_replace_warehouse`` (sharded_etl.py) swaps partition dirs in
place: each partition is atomic, but a reader racing a multi-partition
commit can see shard 3 new while shard 5 is still old. This module adds
the missing property — a reader always sees ONE complete transaction's
view of the whole table:

- partition data is written ADDITIVELY under versioned subdirectories
  ``<table>/_shard=k/quarter=q/txn=<id>/part*.parquet`` (never mutated,
  so in-flight writes are invisible garbage until committed);
- ``_MANIFEST.json`` at the table root maps each partition to the txn
  that owns its current data. Commit = write the new manifest to a temp
  file and ``os.replace`` it — ONE atomic file swap flips every
  partition simultaneously;
- readers resolve the manifest to explicit file paths (one listing of a
  small JSON file — no directory scans of uncommitted data) and load
  them with ``basePath`` so the Hive partition columns still derive;
- ``vacuum`` deletes txn directories no manifest references — the
  Delta VACUUM analog, safe because the manifest swap is the only
  publication point.

Crash story: die during data write → manifest untouched, readers see the
old snapshot, orphan txn dirs are vacuumable garbage. Die during commit
→ ``os.replace`` is atomic, so the manifest is entirely old or entirely
new; there is no torn state to recover.

At 100 TB the manifest is O(#partitions) JSON — the same scale Delta's
checkpoint files carry — and data writes stay fully parallel; only the
driver touches the manifest.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .sharded_etl import SHARD_COL, read_sharded_fact
from .warehouse import clean_fact

MANIFEST = "_MANIFEST.json"
TXN_COL_PREFIX = "txn="


def _manifest_path(table: str) -> str:
    return os.path.join(table, MANIFEST)


def read_manifest(table: str) -> dict:
    try:
        with open(_manifest_path(table)) as fh:
            return json.load(fh)
    except OSError:
        return {"txn": None, "partitions": {}}


def _written_partitions(staging: str):
    """Relative ``_shard=k/quarter=q`` dirs present under a staging root."""
    for shard_dir in sorted(os.listdir(staging)):
        if not shard_dir.startswith(f"{SHARD_COL}="):
            continue
        for q_dir in sorted(os.listdir(os.path.join(staging, shard_dir))):
            if q_dir.startswith("quarter="):
                yield os.path.join(shard_dir, q_dir)


def commit_versioned(
    spark: SparkSession,
    landing_dir: str,
    table: str,
    shards: list[int] | None = None,
    txn_id: str | None = None,
) -> str:
    """Write one transaction: extract+clean the (selected) shards, land
    the output under per-partition ``txn=<id>`` subdirs, then publish by
    atomically swapping the manifest. Returns the txn id."""
    txn_id = txn_id or uuid.uuid4().hex[:12]
    raw = read_sharded_fact(spark, landing_dir)
    if shards is not None:
        raw = raw.filter(F.col(SHARD_COL).isin(shards))
    cleaned = clean_fact(raw)
    # stage in a txn-private root, then MOVE each partition's files under
    # the table's versioned layout (rename within one fs; data files are
    # never rewritten)
    staging = os.path.join(table, f".txn-staging-{txn_id}")
    cleaned.write.partitionBy(SHARD_COL, "quarter").mode("overwrite").parquet(
        staging
    )
    manifest = read_manifest(table)
    for rel in _written_partitions(staging):
        src = os.path.join(staging, rel)
        dst = os.path.join(table, rel, f"{TXN_COL_PREFIX}{txn_id}")
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        os.rename(src, dst)
        manifest["partitions"][rel] = txn_id
    shutil.rmtree(staging, ignore_errors=True)
    _publish(table, manifest, txn_id)
    return txn_id


def _publish(table: str, manifest: dict, txn_id: str) -> None:
    """PUBLICATION POINT: one atomic file swap flips the whole snapshot.
    The per-txn manifest copy is retained first (time-travel log — the
    Delta transaction-log analog; vacuum prunes copies whose data is
    gone)."""
    manifest["txn"] = txn_id
    with open(os.path.join(table, f"_MANIFEST-{txn_id}.json"), "w") as fh:
        json.dump(manifest, fh)
    tmp = _manifest_path(table) + f".tmp-{txn_id}"
    with open(tmp, "w") as fh:
        json.dump(manifest, fh)
    os.replace(tmp, _manifest_path(table))


def read_snapshot(
    spark: SparkSession, table: str, as_of: str | None = None
) -> DataFrame:
    """Load the table AS OF the current manifest — or a historical one
    (``as_of=<txn id>``, time travel: any retained txn manifest whose
    data hasn't been vacuumed). Explicit versioned paths (so uncommitted
    txn dirs are invisible), ``basePath`` derives the Hive partition
    columns, and the snapshot stays stable even if a writer commits
    mid-query — the resolved paths don't change."""
    if as_of is not None:
        with open(os.path.join(table, f"_MANIFEST-{as_of}.json")) as fh:
            manifest = json.load(fh)
    else:
        manifest = read_manifest(table)
    paths = [
        os.path.join(table, rel, f"{TXN_COL_PREFIX}{txn}")
        for rel, txn in sorted(manifest["partitions"].items())
    ]
    if not paths:
        raise FileNotFoundError(f"no committed snapshot at {table}")
    return (
        spark.read.option("basePath", table)
        .parquet(*paths)
        .drop("txn")  # the version dir surfaces as a partition column
    )


def compact_partition(
    spark: SparkSession, table: str, rel: str, target_files: int = 1
) -> str:
    """OPTIMIZE analog: rewrite one partition's current version into
    ``target_files`` files as a NEW txn, then republish. Data is
    bit-identical (a coalesce rewrite, no shuffle of other partitions);
    readers holding the old snapshot are unaffected until vacuum. This is
    the small-file compaction a streaming/backfill-heavy table needs at
    100 TB — run it per hot partition, not table-wide."""
    manifest = read_manifest(table)
    if rel not in manifest["partitions"]:
        raise KeyError(f"unknown partition {rel}")
    txn_id = uuid.uuid4().hex[:12]
    cur = os.path.join(table, rel, f"{TXN_COL_PREFIX}{manifest['partitions'][rel]}")
    dst = os.path.join(table, rel, f"{TXN_COL_PREFIX}{txn_id}")
    spark.read.parquet(cur).coalesce(target_files).write.mode(
        "overwrite"
    ).parquet(dst)
    manifest["partitions"][rel] = txn_id
    _publish(table, manifest, txn_id)
    return txn_id


def vacuum(table: str) -> int:
    """Delete txn directories the CURRENT manifest no longer references
    (old snapshots + crashed writes), plus the time-travel manifests
    whose data just became unreadable. Returns the number of data dirs
    removed. Safe at any time: the manifest swap is the only publication
    point, so anything unreferenced is garbage by definition — but it
    ends time travel to the vacuumed versions, exactly like Delta's
    VACUUM retention floor."""
    manifest = read_manifest(table)
    live = {
        os.path.join(rel, f"{TXN_COL_PREFIX}{txn}")
        for rel, txn in manifest["partitions"].items()
    }
    removed = 0
    for root in list(_written_partitions(table)):
        part_dir = os.path.join(table, root)
        for entry in os.listdir(part_dir):
            if not entry.startswith(TXN_COL_PREFIX):
                continue
            if os.path.join(root, entry) not in live:
                shutil.rmtree(os.path.join(part_dir, entry), ignore_errors=True)
                removed += 1
    # crashed staging roots are garbage too
    for entry in os.listdir(table):
        if entry.startswith(".txn-staging-"):
            shutil.rmtree(os.path.join(table, entry), ignore_errors=True)
            removed += 1
    # historical manifests other than the live one now point at vacuumed
    # data — drop them so time travel fails loudly at open, not mid-scan
    for entry in os.listdir(table):
        if entry.startswith("_MANIFEST-") and entry != f"_MANIFEST-{manifest['txn']}.json":
            os.remove(os.path.join(table, entry))
    return removed
