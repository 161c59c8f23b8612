"""Custom stateful streaming operator via ``applyInPandasWithState``.

Spark's built-in windowed aggregations cover tumbling/sliding/session;
anything else (running per-key totals, custom eviction, decaying
counters) needs explicit state. This module ships the canonical example:
per-user running totals that survive across micro-batches, with the
arithmetic done in integer cents so the streaming result is bit-identical
to the batch twin regardless of batch boundaries.

State design for scale: state lives in the state store partitioned by the
group key (one shuffle on user_id); per-key state is two longs — O(keys)
memory, no per-event growth.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, sum_value double"
STATE_SCHEMA = "n long, cents long"


def _running_totals_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        n, cents = state.get
    else:
        n, cents = 0, 0
    for pdf in pdfs:
        n += len(pdf)
        # integer cents: order-independent, batch-boundary-independent
        cents += int(pdf["value"].mul(100).round().astype("int64").sum())
    state.update((n, cents))
    yield pd.DataFrame(
        {"user_id": [user_id], "n_events": [n], "sum_value": [round(cents / 100, 2)]}
    )


def stream_running_user_totals(stream_df) -> Any:
    """Running (count, sum) per user over an unbounded event stream.

    Emits one updated row per user per micro-batch (update semantics);
    the latest row per user equals the batch groupBy at that point in
    the stream. Attach a sink and trigger at the call site.
    """
    return stream_df.groupBy("user_id").applyInPandasWithState(
        _running_totals_fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def batch_user_totals(events):
    """Batch twin of :func:`stream_running_user_totals` (same cents
    arithmetic)."""
    from pyspark.sql import functions as F

    return events.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.sum(F.round(F.col("value") * 100).cast("long")).cast("double") / 100)
        .alias("_s"),
    ).select(
        "user_id",
        "n_events",
        F.round("_s", 2).alias("sum_value"),
    )
