"""Streaming alert suppression — keyed TTL state.

Reference: `alert/AlertSuppressor.java` (ValueState + expiry timer:
emit first alert per key, drop repeats until expiry),
`alert/AlertSuppressorCount.java:26-36` (re-emit when count changes),
`alert/AlertSuppressorSession.java:41-112` (TTL extended per arrival).

Spark mappings, in preference order:
1. `dropDuplicatesWithinWatermark` — the built-in streaming dedup
   with state TTL'd by the watermark; exactly AlertSuppressor
   semantics when the suppression window equals the watermark delay.
   Zero custom state code, scales via the state store.
2. `applyInPandasWithState` — for count-change re-emit and
   session-TTL variants, which need custom state transitions.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def suppress_stream(
    alerts: DataFrame,
    key_cols: list[str],
    expiry: str = "15 minutes",
    ts_col: str = "timestamp",
) -> DataFrame:
    """T1 AlertSuppressor: first alert per key within the expiry
    horizon. State GC is driven by the event-time watermark."""
    return alerts.withWatermark(ts_col, expiry).dropDuplicatesWithinWatermark(key_cols)


def _suppress_count_fn(ts_col: str, count_col: str, ttl_ms: int):
    def fn(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        last_count = state.get[0] if state.exists else None
        out = []
        last_ts_ms = 0
        for pdf in pdfs:
            pdf = pdf.sort_values(ts_col)
            for _, row in pdf.iterrows():
                c = int(row[count_col])
                last_ts_ms = max(last_ts_ms, int(row[ts_col].value // 1_000_000))
                if last_count is None or c != last_count:
                    out.append(row)
                    last_count = c
        state.update((last_count,))
        # event-time TTL: expire `ttl` past the newest event for the key,
        # GC'd by the watermark (deterministic — the reference's
        # processing-time timer is wall-clock; SURVEY §7 hard part 3).
        # The timestamp must sit ahead of the current watermark or Spark
        # rejects it, hence the max().
        wm_ms = state.getCurrentWatermarkMs()
        state.setTimeoutTimestamp(max(last_ts_ms + ttl_ms, wm_ms + 1))
        if out:
            yield pd.DataFrame(out)

    return fn


def suppress_count_stream(
    alerts: DataFrame,
    key_cols: list[str],
    count_col: str = "count",
    ts_col: str = "timestamp",
    expiry: str = "15 minutes",
) -> DataFrame:
    """T2 AlertSuppressorCount: suppress repeats per key but re-emit
    when the count metadata changes; state expires `expiry` past the
    key's newest event (event-time TTL driven by the watermark — the
    reference's processing-time timer made event-time-deterministic
    per SURVEY §7)."""
    num, unit = expiry.split()
    ttl_ms = int(num) * {"seconds": 1000, "minutes": 60_000, "hours": 3_600_000}[unit]
    out_schema = alerts.schema
    state_schema = T.StructType([T.StructField("last_count", T.LongType())])
    return (
        alerts.withWatermark(ts_col, expiry)
        .groupBy(*key_cols)
        .applyInPandasWithState(
            _suppress_count_fn(ts_col, count_col, ttl_ms),
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def _suppress_session_fn(ts_col: str, ttl_ms: int):
    def fn(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        alive = state.exists
        out = []
        last_ts_ms = 0
        for pdf in pdfs:
            pdf = pdf.sort_values(ts_col)
            for _, row in pdf.iterrows():
                last_ts_ms = max(last_ts_ms, int(row[ts_col].value // 1_000_000))
                if not alive:
                    out.append(row)
                    alive = True
        state.update((last_ts_ms,))
        # session semantics: EVERY arrival extends the TTL, so a key
        # that keeps alerting stays suppressed until it goes quiet for
        # a full `ttl` (AlertSuppressorSession.java:41-112)
        wm_ms = state.getCurrentWatermarkMs()
        state.setTimeoutTimestamp(max(last_ts_ms + ttl_ms, wm_ms + 1))
        if out:
            yield pd.DataFrame(out)

    return fn


def suppress_session_stream(
    alerts: DataFrame,
    key_cols: list[str],
    ts_col: str = "timestamp",
    expiry: str = "15 minutes",
) -> DataFrame:
    """T3 AlertSuppressorSession: emit the first alert per key, then
    suppress while the key stays active — each arrival pushes the
    expiry out by `expiry` (sliding TTL), unlike T1's fixed horizon
    (`alert/AlertSuppressorSession.java:41-112`). Event-time timeout
    per SURVEY §7 hard part 3."""
    num, unit = expiry.split()
    ttl_ms = int(num) * {"seconds": 1000, "minutes": 60_000, "hours": 3_600_000}[unit]
    state_schema = T.StructType([T.StructField("last_seen_ms", T.LongType())])
    return (
        alerts.withWatermark(ts_col, expiry)
        .groupBy(*key_cols)
        .applyInPandasWithState(
            _suppress_session_fn(ts_col, ttl_ms),
            outputStructType=alerts.schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def suppress_count_stream_tws(
    alerts: DataFrame,
    key_cols: list[str],
    count_col: str = "count",
    ts_col: str = "timestamp",
    expiry: str = "15 minutes",
) -> DataFrame:
    """T2 AlertSuppressorCount on the `transformWithState` API
    (Spark 4's successor to `applyInPandasWithState`): same
    count-change re-emit semantics as `suppress_count_stream`, held
    to it by a parity test on the shared fixture.

    Why a second implementation exists: transformWithState is the
    scale path forward — typed state variables (ValueState) instead
    of one flat state row, first-class event-time timers instead of
    the single timeoutTimestamp slot, per-state TTL, and state
    schema evolution on a live checkpoint, all on the RocksDB state
    store provider. The reference's ValueState + expiry-timer pair
    (`alert/AlertSuppressorCount.java:26-36`) maps 1:1 onto
    getValueState + registerTimer, closer than the GroupState
    emulation above.

    Environment note: the transformWithState Python protocol speaks
    protobuf (`pyspark/sql/streaming/proto/StateMessage_pb2`), so
    running this operator needs `google.protobuf` AND the RocksDB
    state store provider
    (`spark.sql.streaming.stateStore.providerClass=...RocksDBStateStoreProvider`).
    The parity test (`test_suppress_count_tws_parity`) skips where
    protobuf is absent; `suppress_count_stream` is the
    dependency-free twin with identical semantics.
    """
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    num, unit = expiry.split()
    ttl_ms = int(num) * {"seconds": 1000, "minutes": 60_000, "hours": 3_600_000}[unit]
    out_schema = alerts.schema

    class _CountReemit(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._handle = handle
            self._last = handle.getValueState("last_count", "c LONG")

        def handleInputRows(self, key, rows, timer_values):
            last = self._last.get()
            last_count = None if last is None else int(last[0])
            newest_ms = 0
            for pdf in rows:
                pdf = pdf.sort_values(ts_col)
                keep = []
                for i, c in enumerate(pdf[count_col]):
                    c = int(c)
                    if last_count is None or c != last_count:
                        keep.append(i)
                        last_count = c
                newest_ms = max(
                    newest_ms, int(pdf[ts_col].max().value // 1_000_000)
                )
                if keep:
                    yield pdf.iloc[keep]
            self._last.update((last_count,))
            # the reference arms one expiry timer per key
            # (AlertSuppressorCount.java: state TTL); re-arming replaces
            # the old timer so the TTL slides with the newest event
            for t in self._handle.listTimers():
                self._handle.deleteTimer(t)
            self._handle.registerTimer(newest_ms + ttl_ms)

        def handleExpiredTimer(self, key, timer_values, expired_timer_info):
            self._last.clear()
            return iter([])

        def close(self) -> None:
            pass

    return (
        alerts.withWatermark(ts_col, expiry)
        .groupBy(*key_cols)
        .transformWithStateInPandas(
            _CountReemit(),
            outputStructType=out_schema,
            outputMode="append",
            timeMode="EventTime",
        )
    )


def suppress_session_stream_tws(
    alerts: DataFrame,
    key_cols: list[str],
    ts_col: str = "timestamp",
    expiry: str = "15 minutes",
) -> DataFrame:
    """T3 AlertSuppressorSession on the `transformWithState` API:
    same sliding-TTL semantics as `suppress_session_stream` (emit the
    first alert per key, suppress while the key stays active, each
    arrival extends the TTL — `alert/AlertSuppressorSession.java:
    41-112`), held to it by a parity test on the shared fixture
    (`test_suppress_session_tws_parity`).

    The reference's session suppressor is a ValueState (last-seen) +
    a timer it re-arms on every element — exactly getValueState +
    deleteTimer/registerTimer here, the 1:1 mapping the GroupState
    emulation approximates through its single timeoutTimestamp slot.
    Same environment seam as `suppress_count_stream_tws`: needs
    google.protobuf + the RocksDB state store provider.
    """
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    num, unit = expiry.split()
    ttl_ms = int(num) * {"seconds": 1000, "minutes": 60_000, "hours": 3_600_000}[unit]
    out_schema = alerts.schema

    class _SessionSuppress(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._handle = handle
            self._seen = handle.getValueState("last_seen", "ms LONG")

        def handleInputRows(self, key, rows, timer_values):
            alive = self._seen.get() is not None
            newest_ms = 0
            for pdf in rows:
                pdf = pdf.sort_values(ts_col)
                newest_ms = max(
                    newest_ms, int(pdf[ts_col].max().value // 1_000_000)
                )
                if not alive:
                    yield pdf.iloc[[0]]
                    alive = True
            self._seen.update((newest_ms,))
            # sliding TTL: every arrival replaces the expiry timer
            for t in self._handle.listTimers():
                self._handle.deleteTimer(t)
            self._handle.registerTimer(newest_ms + ttl_ms)

        def handleExpiredTimer(self, key, timer_values, expired_timer_info):
            self._seen.clear()
            return iter([])

        def close(self) -> None:
            pass

    return (
        alerts.withWatermark(ts_col, expiry)
        .groupBy(*key_cols)
        .transformWithStateInPandas(
            _SessionSuppress(),
            outputStructType=out_schema,
            outputMode="append",
            timeMode="EventTime",
        )
    )
