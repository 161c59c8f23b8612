"""Grouped-map operators: ``applyInPandas`` (per-group pandas frame) and
the native window-function twin.

Completes the engine's declared UDF surface (SURVEY §2.7): scalar
``pandas_udf`` (cleaning twins), per-batch ``mapInPandas`` (multimodal),
per-group ``applyInPandas`` (here), stateful ``applyInPandasWithState``
(streaming). The example op — per-group z-score — exists in BOTH forms
and they are conformance-tested equal, the same native-vs-UDF contract
as the cleaning layer.

Scale note: ``applyInPandas`` shuffles each group to one task and holds
it in memory — fine for bounded groups (per-customer, per-session), a
hazard for power-law groups. The native window twin has the same shuffle
but streams the partition; prefer it whenever the computation is
expressible.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F



def zscore_native(
    df: DataFrame,
    key: str = "o_custkey",
    val: str = "o_totalprice",
    id_col: str = "o_orderkey",
) -> DataFrame:
    """Per-group z-score via window aggregates (sample stddev, ddof=1).
    Single-member groups and zero-variance groups yield null."""
    w = Window.partitionBy(key)
    mean = F.avg(val).over(w)
    std = F.stddev_samp(F.col(val)).over(w)
    z = F.when(std > 0, (F.col(val) - mean) / std)
    return df.select(
        F.col(key), F.col(id_col), F.round(z, 6).alias("zscore")
    )


def zscore_grouped_pandas(
    df: DataFrame,
    key: str = "o_custkey",
    val: str = "o_totalprice",
    id_col: str = "o_orderkey",
) -> DataFrame:
    """Same semantics through ``applyInPandas`` — the per-group pandas
    escape hatch for logic window functions can't express."""

    def per_group(pdf: pd.DataFrame) -> pd.DataFrame:
        std = pdf[val].std(ddof=1)
        if pd.isna(std) or std == 0:
            z = pd.Series([None] * len(pdf), dtype="float64")
        else:
            z = ((pdf[val] - pdf[val].mean()) / std).round(6)
        return pd.DataFrame(
            {key: pdf[key], id_col: pdf[id_col], "zscore": z}
        )

    # applyInPandas matches output columns by name — derive the schema
    # from the actual key/id columns so non-default calls work.
    schema = f"{key} long, {id_col} long, zscore double"
    return df.groupBy(key).applyInPandas(per_group, schema=schema)
