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
from pyspark.sql.types import LongType, StringType, StructField, StructType

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
