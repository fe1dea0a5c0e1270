"""Stateful-streaming query registration (custom operator via
applyInPandasWithState, drained through a memory sink).

The final state per user equals the batch aggregate, so the query IS
SQL-oracle-able: update-mode re-emissions are collapsed by keeping each
user's highest event count (monotone in stream time)."""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import stream_table
from ..registry import query
from ..streaming.stateful import running_user_profile


@query(
    "stream_stateful_user_profile",
    oracle="""
    SELECT user_id, COUNT(*) AS n_events, MIN(ts) AS first_ts, MAX(ts) AS last_ts
    FROM events
    GROUP BY user_id
    """,
)
def stream_stateful_user_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """True streaming custom stateful operator: per-user running profile
    (count, first/last seen) with explicit GroupState, checked against
    the batch aggregate oracle."""
    stream = stream_table(spark, sf_dir, "events")
    out = running_user_profile(stream)
    sink_name = f"profile_{uuid.uuid4().hex[:8]}"
    q = out.writeStream.outputMode("update").format("memory").queryName(sink_name).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    emitted = spark.table(sink_name)
    # Update mode may emit one row per key per micro-batch; the final
    # state has the max count — keep it.
    w = Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
    return (
        emitted.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "n_events",
            F.timestamp_micros(F.col("first_ts_us")).alias("first_ts"),
            F.timestamp_micros(F.col("last_ts_us")).alias("last_ts"),
        )
    )


def _protobuf_available() -> bool:
    # transformWithStateInPandas serializes state via protobuf; the
    # harness container lacks a working google.protobuf, so the Spark 4
    # typed-state query registers only where it can actually run.
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def _register_tws() -> None:
    if not _protobuf_available():
        return
    query(
        "stream_tws_event_counts",
        oracle="""
        SELECT user_id, COUNT(*) AS n_events
        FROM events
        GROUP BY user_id
        """,
    )(stream_tws_event_counts)


def stream_tws_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """transformWithStateInPandas (Spark 4 typed-state API): per-user
    running event counts via ValueState, final state oracled against the
    batch aggregate."""
    from ..streaming.tws_processor import running_event_counts

    stream = stream_table(spark, sf_dir, "events")
    out = running_event_counts(stream)
    sink_name = f"tws_{uuid.uuid4().hex[:8]}"
    q = out.writeStream.outputMode("update").format("memory").queryName(sink_name).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    emitted = spark.table(sink_name)
    w = Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
    return (
        emitted.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "n_events")
    )


_register_tws()
