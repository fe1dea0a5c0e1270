"""Watermark late-data semantics: events older than the watermark are
dropped from append-mode windowed output — the late-data handling the
reference documents as absent (/root/reference/README.md:56-72,
"events are never late" assumption)."""

from __future__ import annotations

import json
import uuid

from pyspark.sql import functions as F
from pyspark.sql import types as T

SCHEMA = T.StructType(
    [
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("k", T.StringType(), True),
    ]
)


def _write_file(dir_, name, rows):
    lines = [json.dumps({"ts": ts, "k": k}) for ts, k in rows]
    (dir_ / name).write_text("\n".join(lines))


def test_late_event_dropped_after_watermark_advances(spark, tmp_path):
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    _write_file(in_dir, "b1.json", [("2024-01-01T10:00:00", "a"), ("2024-01-01T12:00:00", "a")])

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .json(str(in_dir))
    )
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"), "k")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("ws"), "k", "n")
    )
    sink = f"late_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .format("memory")
        .queryName(sink)
        .start()
    )
    try:
        q.processAllAvailable()  # watermark -> 11:50
        # one on-time event (12:30) + one LATE event (10:05 < watermark)
        _write_file(in_dir, "b2.json", [("2024-01-01T12:30:00", "a"), ("2024-01-01T10:05:00", "a")])
        q.processAllAvailable()
        # push the watermark past every open window so they all emit
        _write_file(in_dir, "b3.json", [("2024-01-01T15:00:00", "a")])
        q.processAllAvailable()
        _write_file(in_dir, "b4.json", [("2024-01-01T18:00:00", "a")])
        q.processAllAvailable()
    finally:
        q.stop()

    out = {(r.ws.isoformat(), r.n) for r in spark.table(sink).collect()}
    # the 10:05 late event was DROPPED: 10:00 window emitted with n=1
    assert ("2024-01-01T10:00:00", 1) in out, out
    assert ("2024-01-01T10:00:00", 2) not in out
    # both on-time 12:xx events made their window
    assert ("2024-01-01T12:00:00", 2) in out, out
