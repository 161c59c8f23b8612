"""Custom stateful sessionizer on the Spark 4.1 state API v2
(``transformWithStateInPandas`` + ``StatefulProcessor``).

Why a second sessionizer: the ``applyInPandasWithState`` one
(:mod:`.stateful`) folds incrementally and therefore CONTRACTUALLY
requires per-key in-order arrival across micro-batches (CLAUDE.md
invariant 8). This one drops that caveat: events buffer in ``ListState``
un-sessionized, and sessions are only cut once the watermark has passed
their close time — at which point no non-late event can extend them, so
arrival order inside the watermark delay is irrelevant (the same
buffer-until-watermark argument ``session_window`` itself uses).

State per key: a ListState of (ts_us, cents) pairs plus one event-time
timer at the earliest un-closed session's close time (fires the flush
when a key goes quiet). State size is O(events inside the watermark
horizon) per key — bounded by the watermark delay, not the stream
length; the store is partitioned by the group key (one shuffle).

Environment note: transformWithStateInPandas's Python driver worker
talks protobuf to the JVM (``StateMessage_pb2``); this container ships
no ``google.protobuf`` and package installs are out of scope, so the
conformance test (``test_sessionizer_v2_out_of_order_across_restarts``)
skips where the dependency is absent. The operator is complete and runs
unmodified on any standard Spark 4.1 deployment (protobuf is a release
dependency of PySpark's streaming extras).
"""

from __future__ import annotations

import contextlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

from .stateful import SESSION_OUTPUT_SCHEMA, _cents_half_up

_OUT_COLUMNS = ["user_id", "session_start", "session_end", "n_events", "sum_cents"]


class SessionizerV2(StatefulProcessor):
    """Gap-based sessionizer, order-tolerant inside the watermark delay.

    Emits each closed session exactly once (append semantics):
    (user_id, session_start, session_end = last_ts + gap, n_events,
    sum_cents) — the same rows as the batch gaps-and-islands twin
    (:func:`..events.session_windows_batch`, cents arithmetic).
    """

    def __init__(self, gap_minutes: int = 30) -> None:
        self.gap_us = gap_minutes * 60 * 1_000_000

    def init(self, handle: StatefulProcessorHandle) -> None:
        self.handle = handle
        self.buf = handle.getListState("buf", "ts_us long, cents long")

    def _flush(self, user_id, wm_ms: int):
        """Sessionize the buffer; emit sessions closed strictly before the
        watermark, keep the rest buffered, re-arm the timer.

        Strict '<': an event with ts == watermark is not late yet, and
        with ts == close time it would still extend the session — so a
        session is final only once close < watermark."""
        events = sorted(self.buf.get())
        out: list[tuple] = []
        keep: list[tuple] = []
        next_close_ms: int | None = None
        sess: list[tuple] = []

        def close_of(last_us: int) -> int:
            return (last_us + self.gap_us) // 1000

        def finish(sess_events: list[tuple]) -> None:
            nonlocal next_close_ms
            last_us = sess_events[-1][0]
            if wm_ms > 0 and close_of(last_us) < wm_ms:
                start_us = sess_events[0][0]
                out.append(
                    (
                        user_id,
                        pd.Timestamp(start_us, unit="us"),
                        pd.Timestamp(last_us + self.gap_us, unit="us"),
                        len(sess_events),
                        sum(c for _, c in sess_events),
                    )
                )
            else:
                keep.extend(sess_events)
                c = close_of(last_us)
                if next_close_ms is None or c < next_close_ms:
                    next_close_ms = c

        for ev in events:
            if sess and ev[0] - sess[-1][0] > self.gap_us:
                finish(sess)
                sess = []
            sess.append(ev)
        if sess:
            finish(sess)

        self.buf.clear()
        if keep:
            self.buf.appendList(keep)
        for t in self.handle.listTimers():
            self.handle.deleteTimer(t)
        if next_close_ms is not None:
            self.handle.registerTimer(next_close_ms)
        return out

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        new: list[tuple] = []
        for pdf in rows:
            for ts, value in zip(pdf["ts"], pdf["value"]):
                new.append((int(ts.value // 1000), _cents_half_up(value * 100)))
        if new:
            self.buf.appendList(new)
        out = self._flush(user_id, timerValues.getCurrentWatermarkInMs())
        if out:
            yield pd.DataFrame(out, columns=_OUT_COLUMNS)

    def handleExpiredTimer(self, key, timerValues, expiredTimerInfo) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        out = self._flush(user_id, timerValues.getCurrentWatermarkInMs())
        if out:
            yield pd.DataFrame(out, columns=_OUT_COLUMNS)

    def close(self) -> None:
        pass


_PROVIDER_CONF = "spark.sql.streaming.stateStore.providerClass"
_ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


@contextlib.contextmanager
def rocksdb_state_store(spark):
    """Scope ``spark.sql.streaming.stateStore.providerClass`` = RocksDB to a
    ``with`` block, restoring (or unsetting) the prior value on exit.

    transformWithState only runs on the RocksDB state store (the default
    HDFS-backed provider lacks the column-family support the v2 state
    primitives need), but the conf is session-wide and captured per query
    at START — so start the v2 query inside this block; once started it
    keeps its provider, and later queries (e.g. the v1 GroupState
    sessionizer, validated on the default provider) see the session conf
    they were validated on. Same save/restore discipline as the scoped
    ``nanosAsLong`` conf in ``sources/parquet.py``.
    """
    prior = spark.conf.get(_PROVIDER_CONF, None)
    spark.conf.set(_PROVIDER_CONF, _ROCKSDB_PROVIDER)
    try:
        yield
    finally:
        if prior is None:
            spark.conf.unset(_PROVIDER_CONF)
        else:
            spark.conf.set(_PROVIDER_CONF, prior)


def stream_sessions_v2(stream_df, gap_minutes: int = 30):
    """Closed-session stream via the state-API-v2 sessionizer; tolerant
    of out-of-order per-key arrival up to the watermark delay (which the
    caller sets via ``withWatermark('ts', ...)``).

    Does NOT mutate session conf: the caller must start the query under
    :func:`rocksdb_state_store` (or set the provider conf themselves) —
    the conf is read at query start, after this function returns, so
    setting it here would have to leak session-wide."""
    return stream_df.groupBy("user_id").transformWithStateInPandas(
        SessionizerV2(gap_minutes),
        outputStructType=SESSION_OUTPUT_SCHEMA,
        outputMode="append",
        timeMode="eventTime",
    )
