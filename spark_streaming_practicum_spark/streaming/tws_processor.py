"""transformWithStateInPandas stateful operator (Spark 4 arbitrary-state
API — the successor to applyInPandasWithState, with typed state vars).

``EventTypeCounter``: per-(user, event_type) running counts held in a
ValueState. Complements streaming/stateful.py (the 3.x-era API) so the
engine demonstrates both stateful surfaces Structured Streaming offers.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle
from pyspark.sql.types import DoubleType, LongType, StringType, StructField, StructType

from ..pbcompat import ensure_protobuf

# Runs at driver import AND inside every Python worker that unpickles
# the processor (pyspark's StateMessage_pb2 imports are lazy, so the
# worker-side bootstrap always lands before the first proto use).
ensure_protobuf()

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), True),
        StructField("n_events", LongType(), True),
    ]
)

STATE_SCHEMA = StructType([StructField("n", LongType(), True)])


class UserEventCounter(StatefulProcessor):
    """Counts events per user in a ValueState; emits the running total
    on every update (update output mode)."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._count = handle.getValueState("count", STATE_SCHEMA)

    def handleInputRows(self, key, rows: Iterator[pd.DataFrame], timerValues) -> Iterator[pd.DataFrame]:
        n = self._count.get()[0] if self._count.exists() else 0
        for pdf in rows:
            n += len(pdf)
        self._count.update((n,))
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n]})

    def close(self) -> None:
        pass


MAP_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), True),
        StructField("event_type", StringType(), True),
        StructField("n_events", LongType(), True),
    ]
)


class EventTypeMapCounter(StatefulProcessor):
    """Per-user MapState[event_type -> running count] — exercises the
    typed MAP state variable (point lookups + iterator) the way a
    per-key feature store would; emits the full map after every update
    so update-mode collapse yields the final counts."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._counts = handle.getMapState(
            "type_counts", "event_type string", "n bigint"
        )

    def handleInputRows(self, key, rows: Iterator[pd.DataFrame], timerValues) -> Iterator[pd.DataFrame]:
        for pdf in rows:
            for etype, delta in pdf["event_type"].value_counts().items():
                prev = self._counts.getValue((etype,))
                n = (prev[0] if prev is not None else 0) + int(delta)
                self._counts.updateValue((etype,), (n,))
        types, counts = [], []
        for (etype,), (n,) in self._counts.iterator():
            types.append(etype)
            counts.append(n)
        yield pd.DataFrame(
            {
                "user_id": [key[0]] * len(types),
                "event_type": types,
                "n_events": counts,
            }
        )

    def close(self) -> None:
        pass


def running_type_counts(events_stream: DataFrame) -> DataFrame:
    return (
        events_stream.select("user_id", "event_type")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=EventTypeMapCounter(),
            outputStructType=MAP_OUTPUT_SCHEMA,
            outputMode="update",
            timeMode="none",
        )
    )


def running_event_counts(events_stream: DataFrame) -> DataFrame:
    return (
        events_stream.select("user_id")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=UserEventCounter(),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="update",
            timeMode="none",
        )
    )


LIST_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), True),
        StructField("n_purchases", LongType(), True),
        StructField("top3_sum", DoubleType(), True),
    ]
)


class PurchaseTopValues(StatefulProcessor):
    """Per-user ListState of purchase values — the typed LIST state
    variable (appendList + full get), the shape a bounded-history
    feature (top-k, last-n) needs and ValueState/MapState can't hold.
    Emits the running (count, sum of top-3 values) after every update."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._vals = handle.getListState("purchase_values", "value double")

    def handleInputRows(self, key, rows: Iterator[pd.DataFrame], timerValues) -> Iterator[pd.DataFrame]:
        new = []
        for pdf in rows:
            new.extend((float(v),) for v in pdf["value"])
        if new:
            self._vals.appendList(new)
        vals = sorted((t[0] for t in self._vals.get()), reverse=True)
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_purchases": [len(vals)],
                "top3_sum": [float(sum(vals[:3]))],
            }
        )

    def close(self) -> None:
        pass


def running_purchase_topvals(events_stream: DataFrame) -> DataFrame:
    return (
        events_stream.filter("event_type = 'purchase'")
        .select("user_id", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=PurchaseTopValues(),
            outputStructType=LIST_OUTPUT_SCHEMA,
            outputMode="update",
            timeMode="none",
        )
    )


SESSION_OUTPUT_SCHEMA = StructType(
    [
        StructField("k", StringType(), True),
        StructField("n_events", LongType(), True),
    ]
)

SESSION_GAP_MS = 30 * 60 * 1000


class SessionGapTimers(StatefulProcessor):
    """Session closure via EVENT-TIME TIMERS: every input batch extends
    the key's open session (count + last event time) and re-arms a
    timer at last_ts + gap; the session row is emitted ONLY from
    handleExpiredTimer, when the watermark passes the gap boundary —
    the timer-driven pattern (deleteTimer/registerTimer +
    handleExpiredTimer) that neither ValueState emission nor built-in
    session_window exercises."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._handle = handle
        self._sess = handle.getValueState("sess", "n bigint, last_ms bigint")

    def handleInputRows(self, key, rows: Iterator[pd.DataFrame], timerValues) -> Iterator[pd.DataFrame]:
        n, last_ms = (
            (self._sess.get() or (0, None))
            if self._sess.exists()
            else (0, None)
        )
        for pdf in rows:
            n += len(pdf)
            batch_max = int(pdf["ts"].max().value // 1_000_000)
            last_ms = batch_max if last_ms is None else max(last_ms, batch_max)
        if self._sess.exists():
            old = self._sess.get()
            if old is not None and old[1] is not None:
                self._handle.deleteTimer(old[1] + SESSION_GAP_MS)
        self._sess.update((n, last_ms))
        self._handle.registerTimer(last_ms + SESSION_GAP_MS)
        return iter(())

    def handleExpiredTimer(self, key, timerValues, expiredTimerInfo) -> Iterator[pd.DataFrame]:
        if self._sess.exists():
            n, _last = self._sess.get()
            self._sess.clear()
            yield pd.DataFrame({"k": [key[0]], "n_events": [int(n)]})

    def close(self) -> None:
        pass


def session_counts_with_timers(stream: DataFrame) -> DataFrame:
    return (
        stream.withWatermark("ts", "10 minutes")
        .groupBy("k")
        .transformWithStateInPandas(
            statefulProcessor=SessionGapTimers(),
            outputStructType=SESSION_OUTPUT_SCHEMA,
            outputMode="update",
            timeMode="eventtime",
        )
    )


class WarmStartEventCounter(StatefulProcessor):
    """UserEventCounter with a WARM START: handleInitialState seeds the
    ValueState from a batch-computed DataFrame before the first batch —
    the state-migration path that lets a redesigned streaming job
    inherit state from its predecessor (or from a batch backfill)
    instead of reprocessing history."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._count = handle.getValueState("count", STATE_SCHEMA)

    def handleInitialState(self, key, initialState, timerValues) -> None:
        self._count.update((int(initialState["n_events"].iloc[0]),))

    def handleInputRows(self, key, rows: Iterator[pd.DataFrame], timerValues) -> Iterator[pd.DataFrame]:
        n = self._count.get()[0] if self._count.exists() else 0
        for pdf in rows:
            n += len(pdf)
        self._count.update((n,))
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n]})

    def close(self) -> None:
        pass


def warm_start_event_counts(events_stream: DataFrame, initial_state) -> DataFrame:
    return (
        events_stream.select("user_id")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=WarmStartEventCounter(),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="update",
            timeMode="none",
            initialState=initial_state,
        )
    )


HYST_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), True),
        StructField("n_seen", LongType(), True),
        StructField("alert_state", LongType(), True),
        StructField("n_alert_events", LongType(), True),
    ]
)

HYST_HI, HYST_LO = 80.0, 30.0  # must match operators/windows.py thresholds


class HysteresisLatch(StatefulProcessor):
    """Two-threshold alert latch as TRUE streaming state: ValueState
    holds (latch, events-seen, events-while-alerting). Rows inside a
    chunk are folded in (ts, event_id) order so the stream replays the
    exact machine the batch window computes — the batch/stream parity
    this operator exists to demonstrate."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._st = handle.getValueState(
            "latch", "state bigint, n_seen bigint, n_alert bigint"
        )

    def handleInputRows(self, key, rows: Iterator[pd.DataFrame], timerValues) -> Iterator[pd.DataFrame]:
        state, n_seen, n_alert = (
            self._st.get() if self._st.exists() else (0, 0, 0)
        )
        chunk = pd.concat(list(rows)).sort_values(["ts", "event_id"])
        for v in chunk["value"].to_numpy():
            if v > HYST_HI:
                state = 1
            elif v < HYST_LO:
                state = 0
            n_seen += 1
            n_alert += state
        self._st.update((state, n_seen, n_alert))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_seen": [n_seen],
                "alert_state": [state],
                "n_alert_events": [n_alert],
            }
        )

    def close(self) -> None:
        pass


def running_hysteresis(events_stream: DataFrame) -> DataFrame:
    return (
        events_stream.select("user_id", "event_id", "ts", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=HysteresisLatch(),
            outputStructType=HYST_OUTPUT_SCHEMA,
            outputMode="update",
            timeMode="none",
        )
    )
