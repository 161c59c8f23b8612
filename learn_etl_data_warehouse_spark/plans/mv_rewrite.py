"""Materialized-view auto-rewrite: answer an aggregate request from a
maintained pre-aggregate when it provably covers the request, else fall
back to the raw source.

The MV is an :func:`~learn_etl_data_warehouse_spark.operators.rollups.
hourly_preagg` table (mergeable states: count, fixed-point integer sum,
min, max — maintained incrementally by ``maintain_rollup``). A request
is rewritable when its grouping is COARSER than the MV's grain (a
subset of the MV's key columns, and a time grain that ``date_trunc``
derives from the stored one), and every requested measure derives from
the stored states:

==========  ==============================================
request     derivation from hourly_preagg states
==========  ==============================================
n           Σ n                       (additive)
sum         Σ sum_fp, scaled back once (additive, exact)
avg         half-up((Σ sum_fp)·10^r / (scale·Σ n))  (exact)
min / max   min(min_value) / max(max_value)  (mergeable)
==========  ==============================================

min/max carry the maintain_rollup dirtiness contract: a delete-touched
group stores NULL extrema until refreshed, so the rewriter REFUSES
min/max requests while any stored extremum is null (one cheap scan of
the pre-agg — ~10³-10⁴× smaller than raw) rather than serving a wrong
answer. That mirrors ``analyze_table``'s staleness posture: absent,
never silently wrong.

At 100 TB this is the read-side payoff of the IVM write path: dashboard
grains hit the pre-agg (MBs) instead of re-scanning raw (TBs), and the
decision is a pure metadata check plus at most one pre-agg scan.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from learn_etl_data_warehouse_spark.functions.aggregates import (
    _half_up_div,
    fixed_point_avg,
    fixed_point_sum,
)

# grains date_trunc derives from a stored 'hour' column, coarsest last
_GRAIN_ORDER = ["hour", "day", "week", "month", "quarter", "year"]
_MEASURES = {"n", "sum", "avg", "min", "max"}


@dataclass(frozen=True)
class MVSpec:
    """Declares what an hourly_preagg MV materializes."""

    name: str
    key_cols: tuple[str, ...] = ("event_type",)
    value_col: str = "value"
    scale: int = 10_000
    grain: str = "hour"


@dataclass(frozen=True)
class AggRequest:
    """An aggregate request: group by ``time_grain`` (None = no time
    bucket) + ``group_keys``, computing ``measures`` over the MV's
    value column. Output columns: the time grain name, the keys, then
    the measures by their request names."""

    time_grain: str | None = "day"
    group_keys: tuple[str, ...] = ("event_type",)
    measures: tuple[str, ...] = ("n", "sum")
    round_to: int = 2
    avg_round_to: int = 4


def covers(spec: MVSpec, req: AggRequest) -> bool:
    """Pure metadata check: can ``spec``'s stored states answer ``req``?"""
    if not set(req.group_keys) <= set(spec.key_cols):
        return False
    if not set(req.measures) <= _MEASURES or not req.measures:
        return False
    if req.time_grain is not None:
        if req.time_grain not in _GRAIN_ORDER:
            return False
        if _GRAIN_ORDER.index(req.time_grain) < _GRAIN_ORDER.index(spec.grain):
            return False  # finer than stored — underivable
    return True


def _measure_exprs(req: AggRequest, scale: int) -> list:
    out_scale = 10**req.round_to
    f = scale // out_scale
    exprs = []
    for m in req.measures:
        if m == "n":
            exprs.append(F.sum("n").cast("long").alias("n"))
        elif m == "sum":
            s = F.sum("sum_fp")
            if f <= 1:
                e = F.round(s.cast("double") / F.lit(scale), req.round_to)
            else:
                e = _half_up_div(s, f).cast("double") / F.lit(out_scale)
            exprs.append(e.alias("sum"))
        elif m == "avg":
            a_scale = 10**req.avg_round_to
            num = F.sum("sum_fp") * F.lit(a_scale)
            den = F.lit(scale).cast("long") * F.sum("n")
            exprs.append(
                (_half_up_div(num, den).cast("double") / F.lit(a_scale)).alias("avg")
            )
        elif m == "min":
            exprs.append(F.min("min_value").alias("min"))
        elif m == "max":
            exprs.append(F.max("max_value").alias("max"))
    return exprs


def answer_from_mv(mv: DataFrame, spec: MVSpec, req: AggRequest) -> DataFrame:
    """Re-aggregate the MV's mergeable states to the requested grain.
    Caller must have checked :func:`covers` (raises otherwise)."""
    if not covers(spec, req):
        raise ValueError(f"MV {spec.name} does not cover {req}")
    groups = []
    if req.time_grain is not None:
        groups.append(
            F.date_trunc(req.time_grain, F.col("hour")).alias(req.time_grain)
        )
    groups.extend(F.col(k) for k in req.group_keys)
    return mv.groupBy(*groups).agg(*_measure_exprs(req, spec.scale))


def answer_from_source(
    source: DataFrame, spec: MVSpec, req: AggRequest, time_col: str = "ts"
) -> DataFrame:
    """The fallback path: the same request computed from raw rows with
    the identical fixed-point arithmetic, so both paths are value-equal
    by construction (pinned by the conformance test)."""
    groups = []
    if req.time_grain is not None:
        groups.append(
            F.date_trunc(req.time_grain, F.col(time_col)).alias(req.time_grain)
        )
    groups.extend(F.col(k) for k in req.group_keys)
    v = F.col(spec.value_col)
    exprs = []
    for m in req.measures:
        if m == "n":
            exprs.append(F.count(F.lit(1)).cast("long").alias("n"))
        elif m == "sum":
            exprs.append(fixed_point_sum(v, spec.scale, req.round_to).alias("sum"))
        elif m == "avg":
            exprs.append(
                fixed_point_avg(v, spec.scale, req.avg_round_to).alias("avg")
            )
        elif m == "min":
            exprs.append(F.min(v).alias("min"))
        elif m == "max":
            exprs.append(F.max(v).alias("max"))
    return source.groupBy(*groups).agg(*exprs)


@dataclass
class MVCatalog:
    """Registered MVs, first covering one wins (register selective MVs
    first). ``answer`` returns (frame, route) where route is the MV
    name or ``'source'`` — callers/tests assert the routing decision
    instead of guessing from plans."""

    views: list[tuple[MVSpec, DataFrame]] = field(default_factory=list)

    def register(self, spec: MVSpec, mv: DataFrame) -> None:
        if any(s.name == spec.name for s, _ in self.views):
            raise ValueError(f"MV {spec.name!r} already registered")
        self.views.append((spec, mv))

    def answer(
        self,
        req: AggRequest,
        source: DataFrame,
        source_spec: MVSpec,
        time_col: str = "ts",
    ) -> tuple[DataFrame, str]:
        wants_extrema = bool({"min", "max"} & set(req.measures))
        for spec, mv in self.views:
            if not covers(spec, req):
                continue
            if wants_extrema and not mv.filter(
                F.col("min_value").isNull() | F.col("max_value").isNull()
            ).isEmpty():
                continue  # dirty extrema: refuse, never serve wrong min/max
            return answer_from_mv(mv, spec, req), spec.name
        return answer_from_source(source, source_spec, req, time_col), "source"
