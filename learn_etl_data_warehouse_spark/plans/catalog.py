"""Catalog-level MULTI-TABLE transactions over the manifest warehouse.

``manifest_warehouse`` gives one table snapshot isolation: a single
``_MANIFEST.json`` swap flips every partition of that table at once. But
a warehouse is rarely one table — a fact and its derived rollup, a
corpus and its dedup index, must move TOGETHER or a reader can join
yesterday's rollup against today's fact. Neither Delta nor Iceberg core
offers a multi-table transaction; the same manifest trick simply lifts
one level:

- each table's new state is STAGED publication-inertly: data lands under
  ``txn=<id>`` version dirs (invisible until referenced) and the new
  per-table manifest is written only as the retained
  ``_MANIFEST-<txn>.json`` copy — the table's live ``_MANIFEST.json`` is
  not touched yet;
- ``_CATALOG.json`` at the catalog root maps table name → the table txn
  that is its published snapshot. Commit = ``os.replace`` of the catalog
  file: ONE atomic swap flips every member table simultaneously;
- catalog readers resolve name → table txn → that txn's retained
  manifest (``read_snapshot(as_of=...)``) — they never look at live
  per-table manifests, so a half-finished multi-table write is
  invisible by construction;
- after the catalog swap the live per-table manifests are flipped too
  (convergence for single-table tools). A crash in that window leaves
  live manifests stale — :func:`repair_catalog_tables` re-flips them
  idempotently, and :func:`catalog_vacuum` always repairs first so a
  vacuum can never collect data the catalog still references.

Crash story: die while staging → catalog untouched, every orphan is
vacuumable garbage. Die during the catalog swap → ``os.replace`` is
atomic: old catalog or new catalog, never torn. Die after → repair
converges the live manifests; readers were correct throughout.

At 100 TB the catalog file is O(#tables) — trivially small; all data
movement stays in the per-table staged writes, fully parallel.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import manifest_warehouse as mw


class ForeignKeyViolation(Exception):
    """A catalog commit would publish child rows whose foreign key has
    no parent — the transaction is refused before the atomic swap, so
    readers never see the inconsistent pair (fail-before-publish, the
    expectations-gate posture applied across tables)."""

CATALOG = "_CATALOG.json"


def _catalog_path(catalog_dir: str) -> str:
    return os.path.join(catalog_dir, CATALOG)


def _table_path(catalog_dir: str, name: str) -> str:
    return os.path.join(catalog_dir, name)


def read_catalog(catalog_dir: str, as_of: str | None = None) -> dict:
    """The catalog mapping ``{"txn": id, "tables": {name: table_txn}}``.
    ``as_of`` reads a retained historical catalog (time travel across
    the whole warehouse, not just one table)."""
    path = (
        os.path.join(catalog_dir, f"_CATALOG-{as_of}.json")
        if as_of is not None
        else _catalog_path(catalog_dir)
    )
    try:
        with open(path) as fh:
            return json.load(fh)
    except OSError:
        if as_of is not None:
            raise
        return {"txn": None, "tables": {}}


def catalog_read(
    spark: SparkSession,
    catalog_dir: str,
    name: str,
    as_of: str | None = None,
    prune: dict | None = None,
) -> DataFrame:
    """Load one member table at the catalog's published snapshot. All
    tables read through the same catalog version are MUTUALLY consistent
    — they were published by one commit. Pin ``as_of`` (a catalog txn)
    to hold a stable multi-table view across your own multi-query job
    even while writers keep committing."""
    cat = read_catalog(catalog_dir, as_of)
    if name not in cat["tables"]:
        raise FileNotFoundError(f"table {name!r} not in catalog {catalog_dir}")
    return mw.read_snapshot(
        spark,
        _table_path(catalog_dir, name),
        as_of=cat["tables"][name],
        prune=prune,
    )


def _stage_table(
    table: str,
    df: DataFrame,
    partition_by: list[str],
    txn_id: str,
    replace: bool,
) -> dict:
    """Stage ``df`` as table txn ``txn_id`` WITHOUT publishing: land the
    data under version dirs, return the new manifest after writing it
    only as the retained ``_MANIFEST-<txn>.json`` copy. ``replace=True``
    drops partitions not in this write (full-snapshot semantics);
    ``replace=False`` keeps them (partition-level upsert)."""
    manifest = mw.read_manifest(table)
    if not replace and manifest["partitions"]:
        rel0 = next(iter(manifest["partitions"]))
        existing = (
            []
            if rel0 == "."
            else [seg.split("=", 1)[0] for seg in rel0.split(os.sep)]
        )
        if list(partition_by) != existing:
            raise ValueError(
                f"partition_by {partition_by} does not match existing "
                f"layout {existing} for {table}"
            )
    if replace:
        manifest = {"txn": manifest["txn"], "partitions": {}, "stats": {}}
    staging = os.path.join(table, f".txn-staging-{txn_id}")
    if partition_by:
        df.write.partitionBy(*partition_by).mode("overwrite").parquet(staging)
        rels = sorted(mw._leaf_partitions(staging))
    else:
        df.write.mode("overwrite").parquet(staging)
        rels = ["."]
    for rel in rels:
        src = staging if rel == "." else os.path.join(staging, rel)
        dst = os.path.join(table, rel, f"{mw.TXN_COL_PREFIX}{txn_id}")
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        os.rename(src, dst)
        manifest["partitions"][rel] = txn_id
        mw._invalidate_bloom(manifest, rel)
        manifest.setdefault("stats", {})[rel] = mw._version_stats(dst)
    if rels != ["."]:
        import shutil

        shutil.rmtree(staging, ignore_errors=True)
    manifest["txn"] = txn_id
    manifest["seq"] = int(manifest.get("seq", 0)) + 1  # history ordering
    with open(os.path.join(table, f"_MANIFEST-{txn_id}.json"), "w") as fh:
        json.dump(manifest, fh)
    return manifest


def _flip_live_manifest(table: str, manifest: dict) -> None:
    """Converge the table's live ``_MANIFEST.json`` to an
    already-published catalog state (idempotent; NOT a publication point
    for catalog readers, so it bypasses the optimistic-concurrency check
    deliberately — which also means raw ``manifest_warehouse`` mutators
    racing a catalog commit on a MEMBER table can be overwritten: like
    vacuum, mutations to member tables go through the catalog)."""
    tmp = mw._manifest_path(table) + f".tmp-{manifest['txn']}"
    with open(tmp, "w") as fh:
        json.dump(manifest, fh)
    os.replace(tmp, mw._manifest_path(table))


def catalog_commit(
    spark: SparkSession,
    catalog_dir: str,
    writes: dict[str, tuple[DataFrame, list[str]]],
    replace: bool = True,
    enforce_fks: list[tuple[str, str, str, str]] | None = None,
) -> str:
    """Commit every table in ``writes`` (``{name: (df, partition_by)}``)
    as ONE transaction: a reader resolving through the catalog sees all
    of them flip together or none at all. Tables not written carry their
    current snapshot forward unchanged. Returns the catalog txn id.

    ``enforce_fks=[(child, fk_col, parent, pk_col), ...]`` turns pf06's
    referential AUDIT into a commit-time GUARANTEE: each constraint is
    validated against the POST-transaction state (staged version for
    tables written this txn, current published snapshot otherwise) and
    any non-null child key without a parent raises
    :class:`ForeignKeyViolation` BEFORE the atomic catalog swap —
    readers never observe the violating pair, and the loser's staged
    versions are ordinary vacuumable garbage (the OCC-loser path).
    Cross-table enforcement only makes sense at the catalog grain:
    per-table CHECK constraints can't see the other table, and
    single-table commits could never make a child+parent write atomic.
    One broadcast-anti-join count per constraint reaches the driver —
    bounded scalars, the analyze_table posture."""
    if not writes:
        raise ValueError("catalog_commit needs at least one table write")
    os.makedirs(catalog_dir, exist_ok=True)
    cat = read_catalog(catalog_dir)
    cat_txn = uuid.uuid4().hex[:12]
    staged: dict[str, dict] = {}
    for name, (df, partition_by) in sorted(writes.items()):
        table = _table_path(catalog_dir, name)
        os.makedirs(table, exist_ok=True)
        table_txn = f"{cat_txn}-{name}"
        staged[name] = _stage_table(table, df, partition_by, table_txn, replace)

    def _post_txn(name: str) -> DataFrame:
        table = _table_path(catalog_dir, name)
        if name in staged:
            return mw.read_snapshot(spark, table, as_of=staged[name]["txn"])
        if name in cat["tables"]:
            return mw.read_snapshot(spark, table, as_of=cat["tables"][name])
        raise FileNotFoundError(
            f"enforce_fks references {name!r}, which is neither written "
            f"this transaction nor in the catalog"
        )

    for child, fk_col, parent, pk_col in enforce_fks or []:
        orphans = (
            _post_txn(child)
            .filter(F.col(fk_col).isNotNull())
            .join(
                _post_txn(parent).select(F.col(pk_col).alias(fk_col)).distinct(),
                fk_col,
                "left_anti",
            )
            .count()
        )
        if orphans:
            raise ForeignKeyViolation(
                f"refusing catalog txn {cat_txn!r}: {orphans} row(s) of "
                f"{child}.{fk_col} have no parent in {parent}.{pk_col}"
            )
    new_cat = {
        "txn": cat_txn,
        "tables": {
            **cat["tables"],
            **{name: m["txn"] for name, m in staged.items()},
        },
    }
    _publish_catalog(catalog_dir, new_cat, base_txn=cat["txn"])
    # post-publication convergence of the live per-table manifests
    for name, manifest in sorted(staged.items()):
        _flip_live_manifest(_table_path(catalog_dir, name), manifest)
    return cat_txn


def _publish_catalog(catalog_dir: str, new_cat: dict, base_txn) -> None:
    """Catalog publication with the same optimistic-concurrency contract
    as table commits: the check-and-swap runs under a commit lock, and a
    catalog that moved past ``base_txn`` while this writer was staging
    raises :class:`manifest_warehouse.ConcurrentWriteError` instead of
    silently discarding the interleaved transaction. The loser's staged
    table versions are vacuumable garbage."""
    cat_txn = new_cat["txn"]
    with mw._commit_lock(catalog_dir):
        current_cat = read_catalog(catalog_dir)
        if current_cat["txn"] != base_txn:
            raise mw.ConcurrentWriteError(
                f"catalog moved {base_txn!r} → {current_cat['txn']!r} "
                f"during commit of {cat_txn!r}; retry against the new catalog"
            )
        new_cat["seq"] = int(current_cat.get("seq", 0)) + 1
        # retained copy first (catalog time travel), then THE atomic swap
        with open(
            os.path.join(catalog_dir, f"_CATALOG-{cat_txn}.json"), "w"
        ) as fh:
            json.dump(new_cat, fh)
        tmp = _catalog_path(catalog_dir) + f".tmp-{cat_txn}"
        with open(tmp, "w") as fh:
            json.dump(new_cat, fh)
        os.replace(tmp, _catalog_path(catalog_dir))


def repair_catalog_tables(catalog_dir: str) -> list[str]:
    """Re-flip live per-table manifests to match the published catalog
    (heals a crash between the catalog swap and the convergence flips).
    Idempotent; returns the repaired table names."""
    cat = read_catalog(catalog_dir)
    repaired = []
    for name, table_txn in sorted(cat["tables"].items()):
        table = _table_path(catalog_dir, name)
        if mw.read_manifest(table)["txn"] == table_txn:
            continue
        with open(os.path.join(table, f"_MANIFEST-{table_txn}.json")) as fh:
            manifest = json.load(fh)
        _flip_live_manifest(table, manifest)
        repaired.append(name)
    return repaired


def catalog_vacuum(catalog_dir: str, keep_last: int = 1) -> int:
    """Vacuum every member table — but ALWAYS repair first, so a live
    manifest left stale by a crash can never cause the vacuum to collect
    data the catalog still references. Raw ``manifest_warehouse.vacuum``
    on a member table must go through here for the same reason.

    ``keep_last`` retains the newest N CATALOG snapshots (by the
    catalog's commit seq): their cross-table views stay time-travelable
    as wholes — each member table keeps exactly the table txns those
    retained catalogs reference (explicit pins, not per-table windows,
    so the retained history is mutually consistent across tables).
    Older catalog files and the table versions only they referenced are
    collected. Returns dirs removed."""
    repair_catalog_tables(catalog_dir)
    cat = read_catalog(catalog_dir)
    retained = [cat]
    older = []
    for entry in os.listdir(catalog_dir):
        if entry.startswith("_CATALOG-") and entry.endswith(".json"):
            with open(os.path.join(catalog_dir, entry)) as fh:
                c = json.load(fh)
            if c["txn"] != cat["txn"]:
                older.append(c)
    older.sort(key=lambda c: int(c.get("seq", 0)), reverse=True)
    retained += older[: max(keep_last - 1, 0)]
    retained_cat_txns = {c["txn"] for c in retained}
    pins: dict[str, set] = {}
    for c in retained:
        for name, table_txn in c["tables"].items():
            pins.setdefault(name, set()).add(table_txn)
    removed = 0
    for name in sorted(cat["tables"]):
        removed += mw.vacuum(
            _table_path(catalog_dir, name), keep_txns=pins.get(name, set())
        )
    for entry in os.listdir(catalog_dir):
        if entry.startswith("_CATALOG-") and entry.endswith(".json"):
            txn = entry[len("_CATALOG-"):-len(".json")]
            if txn not in retained_cat_txns:
                os.remove(os.path.join(catalog_dir, entry))
    return removed


def register_catalog_views(
    spark: SparkSession,
    catalog_dir: str,
    as_of: str | None = None,
    prefix: str = "",
) -> str:
    """Expose every member table as a Spark SQL temp view pinned to ONE
    catalog transaction, so ``spark.sql`` users query the governed
    warehouse with plain SQL — the metastore-registration step this
    manifest catalog otherwise lacks.

    The catalog is read ONCE and the resolved txn is passed to every
    ``catalog_read``, so all views belong to the same commit even if
    writers land new transactions mid-registration; and because each
    view's DataFrame resolves the manifest to an explicit file list at
    registration, later commits cannot shift an already-registered view
    (re-register to advance). Returns the pinned catalog txn — hand it
    to a second session to reproduce the exact same multi-table view.
    """
    catalog = read_catalog(catalog_dir, as_of)
    if not catalog["tables"]:
        raise FileNotFoundError(f"empty or missing catalog at {catalog_dir}")
    pinned = catalog["txn"] if as_of is None else as_of
    for name in sorted(catalog["tables"]):
        catalog_read(
            spark, catalog_dir, name, as_of=pinned
        ).createOrReplaceTempView(prefix + name)
    return pinned


MASK_POLICIES = ("hash", "redact", "last4", "null")


def _masked(col: str, policy: str):
    c = F.col(col)
    if policy == "hash":
        # deterministic pseudonym: joins/group-bys on the masked column
        # still line up across tables masked with the same policy
        return F.concat(
            F.lit("h_"), F.lower(F.hex(F.xxhash64(c.cast("string"))))
        ).alias(col)
    if policy == "redact":
        return F.lit("[REDACTED]").alias(col)
    if policy == "last4":
        s = c.cast("string")
        return F.concat(
            F.lit("***"), F.substring(s, -4, 4)
        ).alias(col)
    if policy == "null":
        return F.lit(None).cast("string").alias(col)
    raise ValueError(f"unknown mask policy {policy!r}; use {MASK_POLICIES}")


def register_masked_views(
    spark: SparkSession,
    catalog_dir: str,
    masks: dict[str, dict[str, str]],
    as_of: str | None = None,
    prefix: str = "masked_",
) -> str:
    """Column-masking governance layer over the catalog: register every
    member table as a temp view with PII columns rewritten per policy —
    'hash' (deterministic xxhash64 pseudonym, join-stable), 'redact'
    (constant), 'last4' (suffix-only), 'null'. Tables absent from
    ``masks`` register unmasked under the same prefix, so a consumer
    session sees ONE consistent masked surface and never needs (or
    gets) the raw views.

    Masking is applied INSIDE the registered view's plan — there is no
    unmasked intermediate a ``spark.sql`` user can reach through the
    masked name — and the whole surface pins to one catalog txn, same
    as :func:`register_catalog_views`. Unknown columns in a mask spec
    raise (a typo'd mask that silently no-ops is a leak). Returns the
    pinned txn.
    """
    catalog = read_catalog(catalog_dir, as_of)
    if not catalog["tables"]:
        raise FileNotFoundError(f"empty or missing catalog at {catalog_dir}")
    pinned = catalog["txn"] if as_of is None else as_of
    unknown_tables = set(masks) - set(catalog["tables"])
    if unknown_tables:
        raise ValueError(f"mask spec for non-member tables: {sorted(unknown_tables)}")
    for name in sorted(catalog["tables"]):
        df = catalog_read(spark, catalog_dir, name, as_of=pinned)
        spec = masks.get(name, {})
        missing = set(spec) - set(df.columns)
        if missing:
            raise ValueError(
                f"mask spec for {name!r} names absent columns: {sorted(missing)}"
            )
        cols = [
            _masked(c, spec[c]) if c in spec else F.col(c)
            for c in df.columns
        ]
        df.select(*cols).createOrReplaceTempView(prefix + name)
    return pinned


def register_policy_views(
    spark: SparkSession,
    catalog_dir: str,
    policies: dict[str, str],
    as_of: str | None = None,
    prefix: str = "scoped_",
) -> str:
    """Row-level security layer over the catalog: register member
    tables as temp views filtered by a SQL boolean policy predicate
    (e.g. ``"region = 'EU'"`` — the tenant-scoping /
    row-level-security pattern; :func:`register_masked_views` is the
    column-level sibling and both compose by chaining prefixes).

    The predicate is applied INSIDE the registered plan — the scoped
    name cannot reach unscoped rows — and, because it sits directly
    over the file scan, Catalyst pushes it down like any other filter
    (partition pruning / stats skipping apply). Tables not in
    ``policies`` register unfiltered under the same prefix, so the
    scoped surface is complete. Unknown tables raise; a predicate
    referencing absent columns fails AT REGISTRATION (the schema is
    forced), not on first query. Returns the pinned catalog txn.
    """
    catalog = read_catalog(catalog_dir, as_of)
    if not catalog["tables"]:
        raise FileNotFoundError(f"empty or missing catalog at {catalog_dir}")
    pinned = catalog["txn"] if as_of is None else as_of
    unknown = set(policies) - set(catalog["tables"])
    if unknown:
        raise ValueError(f"policy for non-member tables: {sorted(unknown)}")
    for name in sorted(catalog["tables"]):
        df = catalog_read(spark, catalog_dir, name, as_of=pinned)
        pred = policies.get(name)
        if pred is not None:
            df = df.filter(F.expr(pred))
            df.schema  # force analysis: bad predicates fail HERE
        df.createOrReplaceTempView(prefix + name)
    return pinned


def catalog_erase_key(
    spark: SparkSession,
    catalog_dir: str,
    key_col: str,
    values: list,
) -> str | None:
    """RIGHT-TO-BE-FORGOTTEN erasure across the WHOLE warehouse in one
    transaction: every member table carrying ``key_col`` gets a
    merge-on-read equality-delete for the given values, and a single
    ``_CATALOG.json`` swap publishes all of them together — no reader
    can ever observe the subject half-erased (gone from the fact table,
    still present in the derived rollup).

    The write cost is O(matched keys) per table (delete-key files only;
    no data partition rewrites) — the erasure is effectively instant at
    100 TB, which is what an erasure-deadline SLA needs. It is a
    LOGICAL erasure: raw parquet still holds the bytes, every read path
    filters them. Compliance then completes physically with
    :func:`catalog_purge_table` per touched table (rewrites the data
    files clean) and :func:`catalog_vacuum` (collects historical
    versions and the delete-key files themselves, which contain the
    subject's keys). Returns the catalog txn, or None when no table
    held a matching row."""
    import pyarrow.parquet as pq

    cat = read_catalog(catalog_dir)
    if not cat["tables"]:
        raise FileNotFoundError(f"empty catalog at {catalog_dir}")
    cat_txn = uuid.uuid4().hex[:12]
    staged: dict[str, dict] = {}
    for name, table_txn in sorted(cat["tables"].items()):
        table = _table_path(catalog_dir, name)
        with open(os.path.join(table, f"_MANIFEST-{table_txn}.json")) as fh:
            manifest = json.load(fh)
        df = mw.read_snapshot(spark, table, as_of=table_txn)
        if key_col not in df.columns:
            continue
        keys = (
            df.filter(F.col(key_col).isin(values)).select(key_col).distinct()
        )
        new_txn = f"{cat_txn}-{name}"
        staging = os.path.join(table, f".txn-staging-{new_txn}")
        keys.write.mode("overwrite").parquet(staging)
        n = sum(
            pq.ParquetFile(os.path.join(staging, f)).metadata.num_rows
            for f in os.listdir(staging)
            if f.endswith(".parquet")
        )
        if n == 0:  # subject absent from this table
            import shutil

            shutil.rmtree(staging, ignore_errors=True)
            continue
        dst = os.path.join(table, "_deletes", f"{mw.TXN_COL_PREFIX}{new_txn}")
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        os.rename(staging, dst)
        manifest.setdefault("deletes", []).append(
            {"txn": new_txn, "cols": [key_col], "n": int(n)}
        )
        manifest["txn"] = new_txn
        manifest["seq"] = int(manifest.get("seq", 0)) + 1
        with open(os.path.join(table, f"_MANIFEST-{new_txn}.json"), "w") as fh:
            json.dump(manifest, fh)
        staged[name] = manifest
    if not staged:
        return None
    new_cat = {
        "txn": cat_txn,
        "tables": {
            **cat["tables"],
            **{name: m["txn"] for name, m in staged.items()},
        },
    }
    _publish_catalog(catalog_dir, new_cat, base_txn=cat["txn"])
    for name, manifest in sorted(staged.items()):
        _flip_live_manifest(_table_path(catalog_dir, name), manifest)
    return cat_txn


def catalog_purge_table(
    spark: SparkSession, catalog_dir: str, name: str
) -> str:
    """Physically rewrite one member table's data files to its current
    LOGICAL view (pending merge-on-read deletes folded in) and publish
    through a catalog transaction — step two of the erasure recipe. The
    logical view is unchanged; after this the live data files no longer
    contain the erased bytes, and :func:`catalog_vacuum` can collect
    the historical versions plus the delete-key files."""
    cat = read_catalog(catalog_dir)
    if name not in cat["tables"]:
        raise FileNotFoundError(f"table {name!r} not in catalog {catalog_dir}")
    table = _table_path(catalog_dir, name)
    with open(
        os.path.join(table, f"_MANIFEST-{cat['tables'][name]}.json")
    ) as fh:
        manifest = json.load(fh)
    rel0 = next(iter(manifest["partitions"]))
    partition_by = (
        []
        if rel0 == "."
        else [seg.split("=", 1)[0] for seg in rel0.split(os.sep)]
    )
    df = catalog_read(spark, catalog_dir, name)
    return catalog_commit(
        spark, catalog_dir, {name: (df, partition_by)}, replace=True
    )
