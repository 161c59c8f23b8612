"""Catalog-level multi-table transaction tests (plans/catalog.py):
all-or-nothing publication across tables, cross-table snapshot
isolation for pinned readers, crash recovery at every window, and the
repair-before-vacuum safety property."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from learn_etl_data_warehouse_spark.plans import catalog as cat
from learn_etl_data_warehouse_spark.plans import manifest_warehouse as mw


def _fact(spark, version: int, n: int = 40):
    return spark.range(n).select(
        F.col("id").alias("k"),
        F.concat(F.lit("p"), (F.col("id") % 4).cast("string")).alias("part"),
        (F.col("id") * version).cast("double").alias("amount"),
    )


def _rollup(spark, fact_df):
    return fact_df.groupBy("part").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round(F.col("amount") * 100).cast("long")).alias("amount_fp"),
    )


def _commit_pair(spark, cdir, version: int):
    fact = _fact(spark, version)
    return cat.catalog_commit(
        spark,
        cdir,
        {
            "fact": (fact, ["part"]),
            "rollup": (_rollup(spark, fact), []),  # unpartitioned member
        },
    )


def test_multi_table_commit_is_all_or_nothing(spark, tmp_path):
    cdir = str(tmp_path / "wh")
    t1 = _commit_pair(spark, cdir, version=1)
    # a reader pinned to t1 keeps a mutually-consistent pair across a
    # later commit (cross-table snapshot isolation)
    t2 = _commit_pair(spark, cdir, version=3)
    fact_t1 = cat.catalog_read(spark, cdir, "fact", as_of=t1)
    roll_t1 = cat.catalog_read(spark, cdir, "rollup", as_of=t1)
    recomputed = {
        (r["part"], r["n"], r["amount_fp"])
        for r in _rollup(spark, fact_t1).collect()
    }
    stored = {
        (r["part"], r["n"], r["amount_fp"]) for r in roll_t1.collect()
    }
    assert recomputed == stored, "pinned fact and rollup must be one txn's pair"
    # the live catalog view is the t2 pair, also mutually consistent
    fact_now = cat.catalog_read(spark, cdir, "fact")
    roll_now = cat.catalog_read(spark, cdir, "rollup")
    assert {
        (r["part"], r["n"], r["amount_fp"])
        for r in _rollup(spark, fact_now).collect()
    } == {(r["part"], r["n"], r["amount_fp"]) for r in roll_now.collect()}
    assert t1 != t2


def test_crash_before_catalog_swap_publishes_neither_table(
    spark, tmp_path, monkeypatch
):
    cdir = str(tmp_path / "wh")
    _commit_pair(spark, cdir, version=1)
    before = cat.read_catalog(cdir)
    real_replace = os.replace

    def crash_on_catalog(src, dst):
        if os.path.basename(dst) == cat.CATALOG:
            raise OSError("injected crash: died before catalog swap")
        return real_replace(src, dst)

    monkeypatch.setattr(cat.os, "replace", crash_on_catalog)
    with pytest.raises(OSError, match="injected crash"):
        _commit_pair(spark, cdir, version=9)
    monkeypatch.setattr(cat.os, "replace", real_replace)
    # catalog unchanged → both tables still read the old pair
    assert cat.read_catalog(cdir) == before
    fact = cat.catalog_read(spark, cdir, "fact")
    assert fact.agg(F.max("amount")).first()[0] == 39.0  # version=1 values
    # the orphaned staged versions are garbage; vacuum collects them and
    # the published snapshot survives intact
    removed = cat.catalog_vacuum(cdir)
    assert removed > 0
    assert cat.catalog_read(spark, cdir, "fact").count() == 40


def test_crash_between_swap_and_live_flips_is_repaired(
    spark, tmp_path, monkeypatch
):
    cdir = str(tmp_path / "wh")
    _commit_pair(spark, cdir, version=1)

    real_flip = cat._flip_live_manifest

    def crash_flip(table, manifest):
        raise OSError("injected crash: died before live-manifest flips")

    monkeypatch.setattr(cat, "_flip_live_manifest", crash_flip)
    with pytest.raises(OSError, match="injected crash"):
        _commit_pair(spark, cdir, version=5)
    monkeypatch.setattr(cat, "_flip_live_manifest", real_flip)
    # the catalog DID publish (swap precedes the flips) — catalog readers
    # already see the new consistent pair
    fact = cat.catalog_read(spark, cdir, "fact")
    assert fact.agg(F.max("amount")).first()[0] == 39.0 * 5
    # live per-table manifests are stale → a raw vacuum would collect the
    # catalog's data; catalog_vacuum repairs first and must NOT break it
    stale = mw.read_manifest(os.path.join(cdir, "fact"))["txn"]
    assert stale != cat.read_catalog(cdir)["tables"]["fact"]
    cat.catalog_vacuum(cdir)
    assert (
        mw.read_manifest(os.path.join(cdir, "fact"))["txn"]
        == cat.read_catalog(cdir)["tables"]["fact"]
    )
    assert cat.catalog_read(spark, cdir, "fact").count() == 40
    assert cat.catalog_read(spark, cdir, "rollup").count() == 4


def test_partition_upsert_mode_and_layout_guard(spark, tmp_path):
    cdir = str(tmp_path / "wh")
    _commit_pair(spark, cdir, version=1)
    # upsert only partition part=0 with new amounts; other parts keep data
    patch = _fact(spark, version=7).filter(F.col("part") == "p0")
    cat.catalog_commit(spark, cdir, {"fact": (patch, ["part"])}, replace=False)
    fact = cat.catalog_read(spark, cdir, "fact")
    assert fact.count() == 40
    assert (
        fact.filter(F.col("part") == "p0").agg(F.max("amount")).first()[0]
        == 36.0 * 7
    )
    assert (
        fact.filter(F.col("part") == "p1").agg(F.max("amount")).first()[0]
        == 37.0
    )
    # rollup carried forward untouched by the partial commit
    assert cat.catalog_read(spark, cdir, "rollup").count() == 4
    with pytest.raises(ValueError, match="does not match existing layout"):
        cat.catalog_commit(
            spark, cdir, {"fact": (patch, ["k"])}, replace=False
        )


def test_unknown_table_and_empty_commit_fail_loudly(spark, tmp_path):
    cdir = str(tmp_path / "wh")
    with pytest.raises(ValueError, match="at least one table"):
        cat.catalog_commit(spark, cdir, {})
    _commit_pair(spark, cdir, version=1)
    with pytest.raises(FileNotFoundError, match="not in catalog"):
        cat.catalog_read(spark, cdir, "nope")


def test_concurrent_catalog_commit_detected(spark, tmp_path, monkeypatch):
    """Two catalog writers race: the one that publishes second must get
    ConcurrentWriteError, not silently swallow the first one's tables."""
    cdir = str(tmp_path / "wh")
    _commit_pair(spark, cdir, version=1)

    orig_stage = cat._stage_table
    fired = {"done": False}

    def race(table, df, partition_by, txn_id, replace):
        staged = orig_stage(table, df, partition_by, txn_id, replace)
        if not fired["done"]:
            fired["done"] = True
            # a competing multi-table commit lands while this one stages
            monkeypatch.setattr(cat, "_stage_table", orig_stage)
            _commit_pair(spark, cdir, version=11)
            monkeypatch.setattr(cat, "_stage_table", race)
        return staged

    monkeypatch.setattr(cat, "_stage_table", race)
    with pytest.raises(mw.ConcurrentWriteError, match="catalog moved"):
        _commit_pair(spark, cdir, version=2)
    monkeypatch.setattr(cat, "_stage_table", orig_stage)
    # the competing commit's pair is live and mutually consistent
    fact = cat.catalog_read(spark, cdir, "fact")
    assert fact.agg(F.max("amount")).first()[0] == 39.0 * 11
    # retry succeeds
    _commit_pair(spark, cdir, version=3)
    assert cat.catalog_read(spark, cdir, "fact").agg(
        F.max("amount")
    ).first()[0] == 39.0 * 3


def test_catalog_retention_keeps_consistent_pairs(spark, tmp_path):
    """catalog_vacuum(keep_last=2): the two newest CATALOG snapshots stay
    time-travelable as wholes (fact+rollup mutually consistent), older
    ones are collected — whole-warehouse retention."""
    cdir = str(tmp_path / "wh")
    t1 = _commit_pair(spark, cdir, version=1)
    t2 = _commit_pair(spark, cdir, version=2)
    t3 = _commit_pair(spark, cdir, version=3)

    cat.catalog_vacuum(cdir, keep_last=2)
    # t2's PAIR still reads and is mutually consistent
    fact_t2 = cat.catalog_read(spark, cdir, "fact", as_of=t2)
    roll_t2 = cat.catalog_read(spark, cdir, "rollup", as_of=t2)
    assert fact_t2.agg(F.max("amount")).first()[0] == 39.0 * 2
    assert {
        (r["part"], r["n"], r["amount_fp"])
        for r in _rollup(spark, fact_t2).collect()
    } == {(r["part"], r["n"], r["amount_fp"]) for r in roll_t2.collect()}
    # t1 fell out of the window
    with pytest.raises(OSError):
        cat.catalog_read(spark, cdir, "fact", as_of=t1)
    # live pair intact
    assert (
        cat.catalog_read(spark, cdir, "fact").agg(F.max("amount")).first()[0]
        == 39.0 * 3
    )
    assert t3 == cat.read_catalog(cdir)["txn"]
    # collapsing to live-only ends t2 travel too
    cat.catalog_vacuum(cdir)
    with pytest.raises(OSError):
        cat.catalog_read(spark, cdir, "rollup", as_of=t2)
    assert cat.catalog_read(spark, cdir, "rollup").count() == 4


def test_catalog_read_prunes_via_manifest_stats(spark, tmp_path):
    """catalog_read passes prune= down to the retained manifest's stats —
    data skipping works through the catalog resolution path too."""
    cdir = str(tmp_path / "wh")
    _commit_pair(spark, cdir, version=1)
    # amounts: part p3 holds ids 3,7,…,39 → amount up to 39; p0 max 36
    pruned = cat.catalog_read(spark, cdir, "fact", prune={"amount": (38.5, None)})
    files = pruned.inputFiles()
    assert files and all("part=p3" in f for f in files)
    assert pruned.filter(F.col("amount") >= 38.5).count() == 1  # id 39


def test_register_catalog_views_pins_one_txn(spark, tmp_path):
    cdir = str(tmp_path / "wh")
    t1 = _commit_pair(spark, cdir, version=1)
    pinned = cat.register_catalog_views(spark, cdir)
    assert pinned == t1
    # plain SQL over the governed pair — and the pair is consistent
    joined = spark.sql(
        """SELECT f.part, count(*) AS n
           FROM fact f JOIN rollup r ON f.part = r.part
           GROUP BY f.part"""
    )
    assert joined.count() > 0
    sql_rollup = {
        (r["part"], r["n"], r["amount_fp"]) for r in spark.sql(
            """SELECT part, count(*) AS n,
                      sum(CAST(round(amount * 100) AS BIGINT)) AS amount_fp
               FROM fact GROUP BY part"""
        ).collect()
    }
    stored = {
        (r["part"], r["n"], r["amount_fp"]) for r in spark.sql(
            "SELECT part, n, amount_fp FROM rollup"
        ).collect()
    }
    assert sql_rollup == stored

    # a NEW commit must not shift the already-registered views...
    t2 = _commit_pair(spark, cdir, version=3)
    still = {
        (r["part"], r["n"], r["amount_fp"]) for r in spark.sql(
            "SELECT part, n, amount_fp FROM rollup"
        ).collect()
    }
    assert still == stored
    # ...but re-registration advances to the new pinned txn
    assert cat.register_catalog_views(spark, cdir) == t2
    advanced = {
        (r["part"], r["n"], r["amount_fp"]) for r in spark.sql(
            "SELECT part, n, amount_fp FROM rollup"
        ).collect()
    }
    assert advanced != stored

    # historical pin reproduces the t1 view exactly
    assert cat.register_catalog_views(spark, cdir, as_of=t1, prefix="h_") == t1
    assert {
        (r["part"], r["n"], r["amount_fp"]) for r in spark.sql(
            "SELECT part, n, amount_fp FROM h_rollup"
        ).collect()
    } == stored


def test_masked_views_enforce_policies(spark, tmp_path):
    cdir = str(tmp_path / "cat_masked")
    fact = spark.createDataFrame(
        [(1, "alice@example.com", "4111111111119999", 10.0),
         (2, "bob@example.com", "5500000000004321", 20.0),
         (3, "alice@example.com", "4111111111119999", 30.0)],
        "id long, email string, card string, amount double",
    )
    cat.catalog_commit(spark, cdir, {"users": (fact, [])})
    txn = cat.register_masked_views(
        spark, cdir,
        masks={"users": {"email": "hash", "card": "last4", "amount": "null"}},
    )
    assert txn
    rows = spark.sql(
        "SELECT id, email, card, amount FROM masked_users ORDER BY id"
    ).collect()
    raw = {"alice@example.com", "bob@example.com",
           "4111111111119999", "5500000000004321"}
    for r in rows:
        assert r["email"].startswith("h_") and r["email"] not in raw
        assert r["card"].startswith("***") and len(r["card"]) == 7
        assert r["amount"] is None
    # hash masking is join-stable: same raw value -> same pseudonym
    assert rows[0]["email"] == rows[2]["email"]
    assert rows[0]["email"] != rows[1]["email"]
    assert rows[0]["card"] == "***9999"
    # typo'd specs fail loudly instead of silently leaking
    import pytest as _pytest
    with _pytest.raises(ValueError, match="absent columns"):
        cat.register_masked_views(spark, cdir, masks={"users": {"emial": "hash"}})
    with _pytest.raises(ValueError, match="non-member"):
        cat.register_masked_views(spark, cdir, masks={"nope": {"x": "hash"}})
    with _pytest.raises(ValueError, match="unknown mask policy"):
        cat.register_masked_views(spark, cdir, masks={"users": {"email": "rot13"}})


def test_policy_views_scope_rows(spark, tmp_path):
    cdir = str(tmp_path / "cat_policy")
    rows = spark.createDataFrame(
        [(1, "EU", 10.0), (2, "US", 20.0), (3, "EU", 30.0)],
        "id long, region string, amount double",
    )
    cat.catalog_commit(spark, cdir, {"sales": (rows, [])})
    txn = cat.register_policy_views(
        spark, cdir, policies={"sales": "region = 'EU'"}
    )
    assert txn
    got = spark.sql("SELECT id FROM scoped_sales ORDER BY id").collect()
    assert [r["id"] for r in got] == [1, 3]
    # aggregates through the scoped name can't see unscoped rows
    assert spark.sql(
        "SELECT count(*) AS n FROM scoped_sales WHERE region = 'US'"
    ).collect()[0]["n"] == 0

    import pytest as _pytest
    with _pytest.raises(Exception):  # absent column fails at registration
        cat.register_policy_views(
            spark, cdir, policies={"sales": "tenant_id = 7"}
        )
    with _pytest.raises(ValueError, match="non-member"):
        cat.register_policy_views(spark, cdir, policies={"nope": "1=1"})

    # composes with masking: mask the scoped surface
    cat.register_masked_views(
        spark, cdir, masks={"sales": {"amount": "null"}}, prefix="m_"
    )
    assert spark.sql("SELECT amount FROM m_sales").collect()[0]["amount"] is None


class TestForeignKeyEnforcement:
    """enforce_fks: pf06's audit promoted to a commit-time guarantee —
    fail-before-publish at the catalog grain."""

    def _dims(self, spark, ids):
        return spark.createDataFrame([(i, f"d{i}") for i in ids], "pk long, nm string")

    def _children(self, spark, fks):
        return spark.createDataFrame(
            [(i, fk) for i, fk in enumerate(fks)], "id long, fk long"
        )

    FK = [("child", "fk", "dim", "pk")]

    def test_valid_commit_publishes_and_orphan_commit_refuses(
        self, spark, tmp_path
    ):
        cdir = str(tmp_path / "wh")
        t1 = cat.catalog_commit(
            spark,
            cdir,
            {
                "dim": (self._dims(spark, [1, 2, 3]), []),
                "child": (self._children(spark, [1, 2, None]), []),
            },
            enforce_fks=self.FK,
        )
        assert cat.catalog_read(spark, cdir, "child").count() == 3  # null fk ok

        # orphan child (fk=9) → refused BEFORE the swap; catalog unmoved
        with pytest.raises(cat.ForeignKeyViolation):
            cat.catalog_commit(
                spark,
                cdir,
                {"child": (self._children(spark, [1, 9]), [])},
                enforce_fks=self.FK,
            )
        assert cat.read_catalog(cdir)["txn"] == t1
        got = {r["fk"] for r in cat.catalog_read(spark, cdir, "child").collect()}
        assert got == {1, 2, None}

    def test_cross_table_pair_write_validates_jointly(self, spark, tmp_path):
        """Shrinking the dim and re-pointing the children in ONE txn is
        exactly what single-table enforcement cannot express: each write
        alone would violate, together they satisfy."""
        cdir = str(tmp_path / "wh")
        cat.catalog_commit(
            spark,
            cdir,
            {
                "dim": (self._dims(spark, [1, 2, 3]), []),
                "child": (self._children(spark, [3, 3]), []),
            },
            enforce_fks=self.FK,
        )
        # dim loses pk=3, children move to pk=1 — atomically valid
        t2 = cat.catalog_commit(
            spark,
            cdir,
            {
                "dim": (self._dims(spark, [1, 2]), []),
                "child": (self._children(spark, [1, 1]), []),
            },
            enforce_fks=self.FK,
        )
        assert cat.read_catalog(cdir)["txn"] == t2
        # but shrinking the dim ALONE against the standing children fails
        with pytest.raises(cat.ForeignKeyViolation):
            cat.catalog_commit(
                spark,
                cdir,
                {"dim": (self._dims(spark, [2]), [])},
                enforce_fks=self.FK,
            )

    def test_unknown_table_in_constraint_raises(self, spark, tmp_path):
        cdir = str(tmp_path / "wh")
        with pytest.raises(FileNotFoundError):
            cat.catalog_commit(
                spark,
                cdir,
                {"child": (self._children(spark, [1]), [])},
                enforce_fks=self.FK,
            )
