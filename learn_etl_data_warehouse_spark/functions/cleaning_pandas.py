"""``pandas_udf`` twins of the cleaning layer (SURVEY §2.7).

The reference's architecture deliberately keeps reusable cell-level UDFs in
a module (transformer.py) imported by the server — "a UDF surface" is a
declared capability. The engine's UDF escape hatch is Arrow-batched pandas
UDFs (~10-100× faster than row-at-a-time Python UDFs). Each twin below
reimplements the same semantics as functions.cleaning from the written
spec (not a code copy) and is conformance-tested against the native
expression in tests/test_cleaning.py.

Use the native expressions in production plans; use these when a transform
genuinely cannot be expressed with built-in functions.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T


@F.pandas_udf(T.LongType())
def clean_sci_notation_id_udf(s: pd.Series) -> pd.Series:
    # P1: delete '.' and literal 'E9', then parse int (string surgery).
    out = s.str.replace(".", "", regex=False).str.replace("E9", "", regex=False)
    return pd.to_numeric(out, errors="coerce").astype("Int64")


@F.pandas_udf(T.StringType())
def remove_after_dot_udf(s: pd.Series) -> pd.Series:
    # P2: keep text before the first '.'.
    return s.str.split(".", n=1).str[0]


@F.pandas_udf(T.TimestampType())
def split_date_start_udf(s: pd.Series) -> pd.Series:
    # P3: '<start> s/d <end>' → start timestamp.
    return pd.to_datetime(s.str.split(" s/d ").str[0], format="%Y-%m-%d %H:%M:%S")


@F.pandas_udf(T.TimestampType())
def split_date_end_udf(s: pd.Series) -> pd.Series:
    return pd.to_datetime(s.str.split(" s/d ").str[1], format="%Y-%m-%d %H:%M:%S")


@F.pandas_udf(T.DoubleType())
def get_lat_udf(s: pd.Series) -> pd.Series:
    # P4: strip tabs/spaces, lat = text before first comma.
    cleaned = s.str.replace(r"[\t ]", "", regex=True)
    return pd.to_numeric(cleaned.str.split(",").str[0], errors="coerce")


@F.pandas_udf(T.DoubleType())
def get_lng_udf(s: pd.Series) -> pd.Series:
    # P5: before first tab → trim → first space field → after comma.
    first_field = s.str.split("\t").str[0].str.strip().str.split(" ").str[0]
    return pd.to_numeric(first_field.str.split(",").str[1], errors="coerce")


@F.pandas_udf(T.LongType())
def rounded_dist_udf(s: pd.Series) -> pd.Series:
    # P6: int(float(x)) — truncation toward zero.
    vals = pd.to_numeric(s, errors="coerce")
    return vals.apply(lambda v: None if pd.isna(v) else int(v)).astype("Int64")
