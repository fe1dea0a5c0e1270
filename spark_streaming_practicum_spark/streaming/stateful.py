"""Custom stateful streaming operator (SURVEY.md §2C "Streaming",
reference design space /root/reference/README.md:56-72 — stateful ops
are explicitly absent there; this is the applyInPandasWithState path
Structured Streaming provides for them).

``running_user_profile``: per-user event count + first/last event time,
maintained as explicit group state across micro-batches. State size is
O(1) per user — the shape that scales to 100 TB streams (state is keyed,
checkpointed, and never rescanned)."""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id bigint, n_events bigint, first_ts_us bigint, last_ts_us bigint"
STATE_SCHEMA = "n bigint, first_us bigint, last_us bigint"


def _update_profile(
    key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, first_us, last_us = state.get if state.exists else (0, None, None)
    for pdf in pdfs:
        if pdf.empty:
            continue
        ts_us = pdf["ts"].astype("int64") // 1000  # ns -> us
        n += len(pdf)
        lo, hi = int(ts_us.min()), int(ts_us.max())
        first_us = lo if first_us is None else min(first_us, lo)
        last_us = hi if last_us is None else max(last_us, hi)
    state.update((n, first_us, last_us))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "first_ts_us": [first_us],
            "last_ts_us": [last_us],
        }
    )


def running_user_profile(events_stream: DataFrame) -> DataFrame:
    """Apply the stateful per-user profile over a streaming events frame."""
    return (
        events_stream.select("user_id", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_profile,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
