"""Stateful streaming recovery: a watermarked windowed aggregation is
stopped mid-stream and restarted from its checkpoint; the native parquet
file sink (with its _spark_metadata transaction log) must end up with
exactly the batch-equivalent result — no lost windows, no duplicates.

This is the strongest exactly-once statement the engine makes: state
(window partials + watermark) AND sink output both survive the restart.
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F
from pyspark.sql import types as T

SCHEMA = T.StructType(
    [
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("k", T.StringType(), True),
        T.StructField("v", T.DoubleType(), True),
    ]
)


def _write_file(dir_, name, rows):
    (dir_ / name).write_text(
        "\n".join(json.dumps({"ts": ts, "k": k, "v": v}) for ts, k, v in rows)
    )


def _start(spark, in_dir, out_dir, ckpt_dir):
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .json(str(in_dir))
    )
    agg = (
        stream.withWatermark("ts", "5 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"), "k")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("sum_v"))
        .select(F.col("w.start").alias("ws"), "k", "n", "sum_v")
    )
    return (
        agg.writeStream.outputMode("append")
        .option("checkpointLocation", str(ckpt_dir))
        .format("parquet")
        .option("path", str(out_dir))
        .start()
    )


def test_windowed_state_survives_restart(spark, tmp_path):
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    out_dir, ckpt = tmp_path / "out", tmp_path / "ckpt"

    _write_file(in_dir, "b1.json", [("2024-01-01T10:10:00", "a", 1.0), ("2024-01-01T10:20:00", "a", 2.0)])
    _write_file(in_dir, "b2.json", [("2024-01-01T11:30:00", "b", 3.0)])

    q1 = _start(spark, in_dir, out_dir, ckpt)
    try:
        q1.processAllAvailable()  # 10:00 window closes once wm passes 11:00
    finally:
        q1.stop()

    # new files arrive while the query is DOWN
    _write_file(in_dir, "b3.json", [("2024-01-01T12:40:00", "b", 4.0)])
    _write_file(in_dir, "b4.json", [("2024-01-01T14:00:00", "c", 5.0)])

    q2 = _start(spark, in_dir, out_dir, ckpt)
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()

    out = {
        (r.ws.isoformat(), r.k): (r.n, r.sum_v)
        for r in spark.read.parquet(str(out_dir)).collect()
    }
    # every closed window exactly once, with pre-restart state intact:
    assert out[("2024-01-01T10:00:00", "a")] == (2, 3.0)
    assert out[("2024-01-01T11:00:00", "b")] == (1, 3.0)
    assert out[("2024-01-01T12:00:00", "b")] == (1, 4.0)
    # no duplicated emissions across the restart
    rows = spark.read.parquet(str(out_dir)).collect()
    assert len(rows) == len({(r.ws, r.k) for r in rows})


def test_custom_group_state_survives_restart(spark, tmp_path):
    """applyInPandasWithState: the per-user ValueState built from batch 1
    must still be there after a stop/restart, so batch 2's emissions
    continue the counts instead of restarting from zero."""
    from pyspark.sql import functions as F

    from spark_streaming_practicum_spark.streaming.stateful import running_user_profile

    in_dir = tmp_path / "sin"
    in_dir.mkdir()
    out_dir, ckpt = tmp_path / "sout", tmp_path / "sckpt"

    ev_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType(), True),
            T.StructField("ts", T.TimestampType(), True),
        ]
    )

    def write_events(name, rows):
        (in_dir / name).write_text(
            "\n".join(json.dumps({"user_id": u, "ts": ts}) for u, ts in rows)
        )

    def run_stream():
        stream = (
            spark.readStream.schema(ev_schema)
            .option("maxFilesPerTrigger", "1")
            .json(str(in_dir))
        )
        out = running_user_profile(stream)
        q = (
            out.writeStream.outputMode("update")
            .option("checkpointLocation", str(ckpt))
            .foreachBatch(
                lambda df, bid: df.write.mode("append").parquet(str(out_dir))
            )
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    write_events("e1.json", [(1, "2024-01-01T10:00:00"), (1, "2024-01-01T10:05:00"), (2, "2024-01-01T10:06:00")])
    run_stream()

    write_events("e2.json", [(1, "2024-01-01T11:00:00"), (2, "2024-01-01T11:01:00"), (2, "2024-01-01T11:02:00")])
    run_stream()  # NEW query, SAME checkpoint -> state must be recovered

    emitted = spark.read.parquet(str(out_dir))
    final = (
        emitted.groupBy("user_id")
        .agg(F.max("n_events").alias("n"), F.min("first_ts_us").alias("f"), F.max("last_ts_us").alias("l"))
        .collect()
    )
    by_user = {r.user_id: (r.n, r.f, r.l) for r in final}
    # counts CONTINUE across the restart (not reset): user 1 -> 3, user 2 -> 3
    assert by_user[1][0] == 3
    assert by_user[2][0] == 3
    # first-seen survives from before the restart
    import datetime as dt

    assert by_user[1][1] == int(dt.datetime(2024, 1, 1, 10, 0).timestamp() * 1e6)
    assert by_user[2][2] == int(dt.datetime(2024, 1, 1, 11, 2).timestamp() * 1e6)
