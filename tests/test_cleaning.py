"""Cleaning layer: exact reference semantics (SURVEY §2.2 P1-P8) +
native-vs-pandas_udf conformance (§2.7)."""

from __future__ import annotations

from pyspark.sql import functions as F

from learn_etl_data_warehouse_spark.functions import cleaning as c
from learn_etl_data_warehouse_spark.functions import cleaning_pandas as cp
from learn_etl_data_warehouse_spark.functions.datetime_fns import quarter_key


def test_clean_sci_notation_id(spark):
    df = spark.createDataFrame(
        [("6.171031002E9",), ("6171030001",), ("6.1710E9",)], ["v"]
    )
    out = [r[0] for r in df.select(c.clean_sci_notation_id("v")).collect()]
    # string surgery: delete '.' and 'E9' then parse — NOT float parsing
    assert out == [6171031002, 6171030001, 61710]


def test_remove_after_dot(spark):
    df = spark.createDataFrame([("6171010003.0",), ("nan",), ("12",)], ["v"])
    out = [r[0] for r in df.select(c.remove_after_dot("v")).collect()]
    assert out == ["6171010003", "nan", "12"]


def test_split_date_process(spark):
    df = spark.createDataFrame(
        [("2019-03-09 20:45:00 s/d 2019-03-09 22:05:00",)], ["v"]
    )
    row = df.select(
        c.split_date_start("v").alias("s"), c.split_date_end("v").alias("e")
    ).collect()[0]
    assert row["s"].isoformat() == "2019-03-09T20:45:00"
    assert row["e"].isoformat() == "2019-03-09T22:05:00"


def test_latlng_clean_and_corrupt(spark):
    corrupt = "-0.0384513,109.3270047 " + "\t" * 31 + "-0.0384513"
    df = spark.createDataFrame([("-0.05,109.31",), (corrupt,)], ["v"])
    rows = df.select(
        c.get_lat("v").alias("lat"), c.get_lng("v").alias("lng")
    ).collect()
    assert rows[0]["lat"] == -0.05 and rows[0]["lng"] == 109.31
    assert rows[1]["lat"] == -0.0384513 and rows[1]["lng"] == 109.3270047


def test_rounded_dist_truncates_toward_zero(spark):
    df = spark.createDataFrame([("5.55",), ("0.0",), ("-2.7",)], ["v"])
    out = [r[0] for r in df.select(c.rounded_dist("v")).collect()]
    assert out == [5, 0, -2]  # int(float(x)) semantics, not rounding


def test_duration_minutes_truncates(spark):
    df = spark.createDataFrame(
        [("2019-03-09 20:45:00 s/d 2019-03-09 22:05:30",)], ["v"]
    )
    out = df.select(
        c.duration_minutes(
            c.split_date_start("v"), c.split_date_end("v")
        ).alias("d")
    ).collect()[0]["d"]
    assert out == 80  # 80.5 minutes truncates to 80


def test_empty_to_null_and_is_male(spark):
    df = spark.createDataFrame([("", "L"), ("77.0", "P")], ["m", "g"])
    rows = df.select(
        c.empty_to_null("m").alias("m"), c.is_male("g").alias("im")
    ).collect()
    assert rows[0]["m"] is None and rows[0]["im"] is True
    assert rows[1]["m"] == "77.0" and rows[1]["im"] is False


def test_quarter_key_period_format(spark):
    df = spark.createDataFrame(
        [("2018-07-01 00:00:00",), ("2019-01-31 23:59:59",)], ["v"]
    )
    out = [
        r[0]
        for r in df.select(quarter_key(F.to_timestamp("v"))).collect()
    ]
    assert out == ["2018Q3", "2019Q1"]  # str(pd.Period) parity


def test_native_vs_pandas_udf_conformance(spark):
    """Dual-path conformance (SURVEY §5): native expressions and
    pandas_udf twins must agree row-for-row."""
    corrupt = "-0.0384513,109.3270047 " + "\t" * 31 + "-0.0384513"
    df = spark.createDataFrame(
        [
            ("6.171031002E9", "6171010003.0", "2019-03-09 20:45:00 s/d 2019-03-09 22:05:00", "-0.05,109.31", "5.55"),
            ("6171030001", "nan", "2018-12-31 23:00:00 s/d 2019-01-01 01:30:00", corrupt, "0.0"),
        ],
        ["sci", "dot", "dp", "latlng", "dist"],
    )
    pairs = [
        (c.clean_sci_notation_id("sci"), cp.clean_sci_notation_id_udf("sci")),
        (c.remove_after_dot("dot"), cp.remove_after_dot_udf("dot")),
        (c.split_date_start("dp"), cp.split_date_start_udf("dp")),
        (c.split_date_end("dp"), cp.split_date_end_udf("dp")),
        (c.get_lat("latlng"), cp.get_lat_udf("latlng")),
        (c.get_lng("latlng"), cp.get_lng_udf("latlng")),
        (c.rounded_dist("dist"), cp.rounded_dist_udf("dist")),
    ]
    sel = []
    for i, (native, udf) in enumerate(pairs):
        sel += [native.alias(f"n{i}"), udf.alias(f"u{i}")]
    for row in df.select(*sel).collect():
        for i in range(len(pairs)):
            assert row[f"n{i}"] == row[f"u{i}"], f"pair {i}: {row}"
