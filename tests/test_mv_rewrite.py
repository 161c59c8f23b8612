"""MV auto-rewrite: routing decisions + value-equality of both routes.

The contract under test: a covered request answered from the pre-agg is
VALUE-IDENTICAL to the raw-source aggregation (the fixed-point states
merge exactly), the rewriter refuses requests it cannot prove (finer
grain, unknown key, dirty extrema), and the MV route never reads the
raw table's files.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from learn_etl_data_warehouse_spark.operators.rollups import (
    hourly_preagg,
    maintain_rollup,
)
from learn_etl_data_warehouse_spark.plans.mv_rewrite import (
    AggRequest,
    MVCatalog,
    MVSpec,
    covers,
)
from learn_etl_data_warehouse_spark.sources.parquet import load_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events(spark):
    return load_table(spark, SF_DIR, "events")


@pytest.fixture(scope="module")
def setup(spark, events, tmp_path_factory):
    root = tmp_path_factory.mktemp("mv")
    src_path = str(root / "events_src")
    mv_path = str(root / "mv_hourly")
    events.write.parquet(src_path)
    src = spark.read.parquet(src_path)
    hourly_preagg(src).write.parquet(mv_path)
    mv = spark.read.parquet(mv_path)
    spec = MVSpec("mv_hourly", key_cols=("event_type",))
    cat = MVCatalog()
    cat.register(spec, mv)
    return cat, spec, src, src_path, mv_path


def _rows(df):
    cols = sorted(df.columns)
    return sorted(
        tuple(r[c] for c in cols) for r in df.collect()
    )


def test_covered_request_routes_to_mv_and_matches_source(setup):
    cat, spec, src, src_path, mv_path = setup
    req = AggRequest(time_grain="day", group_keys=("event_type",),
                     measures=("n", "sum", "avg", "min", "max"))
    from_mv, route = cat.answer(req, src, spec)
    assert route == "mv_hourly"
    from learn_etl_data_warehouse_spark.plans.mv_rewrite import (
        answer_from_source,
    )
    assert _rows(from_mv) == _rows(answer_from_source(src, spec, req))
    # the MV route must not touch the raw table's files
    files = from_mv.inputFiles()
    assert files and all(mv_path in f for f in files)
    assert all(src_path not in f for f in files)


def test_global_and_keyless_grains_covered(setup):
    cat, spec, src, _, _ = setup
    from learn_etl_data_warehouse_spark.plans.mv_rewrite import (
        answer_from_source,
    )
    for req in (
        AggRequest(time_grain=None, group_keys=("event_type",), measures=("n", "sum")),
        AggRequest(time_grain="month", group_keys=(), measures=("avg",)),
    ):
        got, route = cat.answer(req, src, spec)
        assert route == "mv_hourly"
        assert _rows(got) == _rows(answer_from_source(src, spec, req))


def test_uncovered_requests_fall_back_to_source(setup):
    cat, spec, src, _, _ = setup
    # finer-than-stored grain is underivable (grain list has no
    # sub-hour entry, so model it with an unknown key + unknown grain)
    for req in (
        AggRequest(time_grain="day", group_keys=("user_id",)),   # key not in MV
        AggRequest(time_grain="minute", group_keys=()),          # finer grain
    ):
        assert not covers(spec, req)
    req = AggRequest(time_grain="day", group_keys=("user_id",), measures=("n",))
    got, route = cat.answer(req, src, spec)
    assert route == "source"
    assert got.count() > 0


def test_dirty_extrema_refused_but_additive_served(spark, events, setup):
    cat0, spec, src, _, _ = setup
    prev = hourly_preagg(src)
    # delete one row from a group that SURVIVES (n > 1) -> its min/max
    # go dirty; a fully-deleted group would just drop out instead
    big = prev.filter(F.col("n") > 1).orderBy("hour", "event_type").limit(1)
    victim = (
        src.withColumn("hour", F.date_trunc("hour", "ts"))
        .join(F.broadcast(big.select("hour", "event_type")), ["hour", "event_type"])
        .orderBy("event_id")
        .limit(1)
        .drop("hour")
        .withColumn("_change_type", F.lit("delete"))
    )
    maintained, dirty = maintain_rollup(prev, victim)
    assert dirty.count() == 1
    cat = MVCatalog()
    cat.register(spec, maintained)
    with_extrema = AggRequest(time_grain="day", measures=("n", "max"))
    got, route = cat.answer(with_extrema, src, spec)
    assert route == "source"  # refused: never serve a maybe-wrong max
    additive = AggRequest(time_grain="day", measures=("n", "sum"))
    got, route = cat.answer(additive, src, spec)
    assert route == "mv_hourly"  # additive states are exact regardless
