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
from decimal import ROUND_HALF_UP, Decimal
from typing import Any

import numpy as np
import pandas as pd
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, sum_value double"
STATE_SCHEMA = "n long, cents long"


def _cents_half_up(x) -> int:
    """Mirror Spark's ``F.round`` on doubles exactly: Java does
    ``BigDecimal.valueOf(double)`` (shortest decimal repr, same as Python
    ``repr``) then ``setScale(0, HALF_UP)``. The float trick
    ``floor(|x|+0.5)`` diverges for doubles just below a half boundary —
    e.g. ``m + 0.49999999999999994``, where adding 0.5 rounds up in binary
    — so it must not be used here."""
    return int(Decimal(repr(float(x))).quantize(Decimal(1), rounding=ROUND_HALF_UP))


def _cents_half_up_arr(values) -> np.ndarray:
    """Vectorized :func:`_cents_half_up` for the hot per-batch path.

    A per-row ``Decimal(repr(x))`` inside applyInPandasWithState is an
    interpreter loop that dominates at real stream rates, so the bulk of
    each batch takes the numpy fast path ``sign(x)·floor(|x|+0.5)``
    (HALF_UP = round half away from zero). That trick and the
    repr-based BigDecimal rounding can only disagree when ``|x|+0.5``
    lands within a float-rounding error of an integer — the shortest
    repr differs from the binary value by < 0.5 ulp, and the addition
    itself errs by ≤ 0.5 ulp — so elements with ``|x|+0.5`` inside an
    8-ulp guard band around an integer (a measure-zero sliver of inputs:
    exact halves and the 0.49999999999999994-type neighbors) fall back
    to the exact scalar. Conformance is pinned by the boundary test
    battery in tests/test_streaming.py."""
    v = np.asarray(values, dtype=np.float64)
    # NaN/Inf: the fast path's floor(...).astype(int64) is
    # platform-defined garbage for non-finite values — mask them out of
    # the vector lanes and route them to the scalar path, which raises
    # loudly (InvalidOperation/OverflowError) as the pre-vectorized
    # code did.
    finite = np.isfinite(v)
    vf = np.where(finite, v, 0.0)
    d = np.abs(vf) + 0.5
    ambiguous = (np.abs(d - np.rint(d)) <= 8 * np.spacing(d)) | ~finite
    out = (np.sign(vf) * np.floor(d)).astype(np.int64)
    if ambiguous.any():
        idx = np.nonzero(ambiguous)[0]
        out[idx] = [_cents_half_up(v[i]) for i in idx]
    return out


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
        # integer cents: order-independent, batch-boundary-independent.
        # _cents_half_up_arr mirrors the batch twin's F.round bit-exactly
        # (vectorized; Decimal only at half boundaries).
        cents += int(_cents_half_up_arr(pdf["value"].to_numpy() * 100).sum())
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


SESSION_OUTPUT_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "n_events long, sum_cents long"
)
SESSION_STATE_SCHEMA = (
    "start_us long, last_us long, n long, cents long"
)


def make_session_fn(gap_minutes: int = 30):
    """Custom sessionizer with explicit state + event-time timeout:
    emits a session row only when the gap passes (or the state times
    out), i.e. closed sessions — the semantics ``session_window`` gives
    you, rebuilt on raw GroupState to show the full control surface
    (custom gap logic, per-session payloads, side outputs all slot in
    here).

    State: (start_us, last_us, n, cents). Events inside a micro-batch
    are sorted by ts; a gap > gap_minutes closes the current session,
    emits it, and starts the next. The event-time timeout closes the
    final session once the watermark passes last_ts + gap.

    Contract: per-key events must arrive in event-time order ACROSS
    micro-batches (the Kafka-partition-per-key guarantee); the fold is
    incremental and does not reorder history. For sources violating
    that, use the native ``session_window`` path
    (:func:`..events.session_windows_native`), which buffers
    out-of-order rows up to the watermark."""
    gap_us = gap_minutes * 60 * 1_000_000

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        (user_id,) = key
        out: list[tuple] = []

        def emit(start_us: int, last_us: int, n: int, cents: int) -> None:
            out.append(
                (
                    user_id,
                    pd.Timestamp(start_us, unit="us"),
                    pd.Timestamp(last_us + gap_us, unit="us"),
                    n,
                    cents,
                )
            )

        if state.hasTimedOut:
            if state.exists:
                emit(*state.get)
            state.remove()
        else:
            rows = pd.concat(list(pdfs)).sort_values("ts")
            if state.exists:
                start_us, last_us, n, cents = state.get
            else:
                start_us = last_us = n = cents = None

            # rounding vectorized up front; the remaining per-row loop is
            # the inherently sequential gap fold
            all_cents = _cents_half_up_arr(rows["value"].to_numpy() * 100)
            for ts, v_cents in zip(rows["ts"], all_cents):
                ts_us = int(ts.value // 1000)
                v_cents = int(v_cents)
                if start_us is None:
                    start_us, last_us, n, cents = ts_us, ts_us, 1, v_cents
                elif ts_us - last_us > gap_us:
                    emit(start_us, last_us, n, cents)
                    start_us, last_us, n, cents = ts_us, ts_us, 1, v_cents
                else:
                    last_us, n, cents = ts_us, n + 1, cents + v_cents
            # If the watermark already passed this session's close time,
            # close it now — a timeout in the past is invalid.
            wm_ms = state.getCurrentWatermarkMs()
            close_ms = last_us // 1000 + gap_us // 1000
            if wm_ms > 0 and close_ms <= wm_ms:
                emit(start_us, last_us, n, cents)
                if state.exists:
                    state.remove()
            else:
                state.update((start_us, last_us, n, cents))
                state.setTimeoutTimestamp(close_ms)
        yield pd.DataFrame(
            out,
            columns=["user_id", "session_start", "session_end", "n_events", "sum_cents"],
        )

    return fn


def stream_sessions_custom(stream_df, gap_minutes: int = 30):
    """Closed-session stream via the custom stateful sessionizer.
    Requires a watermark on ts (drives the event-time timeout)."""
    return stream_df.groupBy("user_id").applyInPandasWithState(
        make_session_fn(gap_minutes),
        outputStructType=SESSION_OUTPUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
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
