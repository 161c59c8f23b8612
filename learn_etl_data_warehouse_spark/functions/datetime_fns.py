"""Date-part derivations (SURVEY §2.4 A1/A2, §2.6).

The reference's quarter key is ``str(pd.Period('Q'))`` — ``'2018Q3'``
(server.py:101-102; verified against the golden warehouse's QUART_* table
names). The hour extraction feeds the EP3 dashboards (server.py:253,261).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def quarter_key(ts: Column | str) -> Column:
    """``'2018Q3'``-format quarter key — exact ``str(pd.Period)`` parity.

    Derived as a column, not a dict-of-DataFrames: at scale this becomes a
    ``partitionBy`` column so per-quarter lookups are partition-pruned
    scans (SURVEY §4 "Partition pruning")."""
    c = _c(ts)
    return F.concat(F.year(c).cast("string"), F.lit("Q"), F.quarter(c).cast("string"))


def hour_of(ts: Column | str) -> Column:
    """Hour-of-day extraction (server.py:250-264)."""
    return F.hour(_c(ts))
