"""Sustained-load soak: the reference system contract at ~100x its rate.

The reference producer emits 100-event batches every 10 s (~10 events/s;
/root/reference/docker-compose.yaml) with fault injection at corruption
0.1 / invalid 0.1 / duplicates 0.1. This soak drives the SAME full
parse -> validate -> route -> dual-parquet-sink path at ~1000 events/s
for ~28 s of WALL-CLOCK-PACED production (files land while the stream
runs — not a pre-staged directory), then certifies:

1. the keep-up SLO (BASELINE.md): processedRowsPerSecond >=
   inputRowsPerSecond on the micro-batches that carried data, and the
   backlog drains within a small grace window after the producer stops;
2. dead-letter accounting EXACTLY matches the deterministic ground
   truth replay (seeded factory + serializer), and the measured
   dead-letter ratios sit at the injected 10% rates.
"""

from __future__ import annotations

import json
import threading
import time

from pyspark.sql import types as T

from spark_streaming_practicum_spark.producer import (
    BatchSerializer,
    EventFactory,
    produce,
)
from spark_streaming_practicum_spark.sources.streaming import text_file_stream
from spark_streaming_practicum_spark.streaming.processor import StreamProcessor
from spark_streaming_practicum_spark.streaming.sinks import ParquetSink

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.StringType(), nullable=False),
        T.StructField("event_id", T.StringType(), nullable=False),
        T.StructField("event_timestamp", T.TimestampType(), nullable=False),
        T.StructField("event_type", T.StringType(), nullable=False),
        T.StructField("product_id", T.StringType(), nullable=True),
        T.StructField("properties", T.MapType(T.StringType(), T.StringType()), nullable=True),
    ]
)

BATCH_SIZE = 200
BATCHES_PER_SEC = 5  # x200 = ~1000 events/s, ~100x the reference rate
DURATION_S = 28  # wall-clock floor of the test; longer adds no new assertion power
TOTAL_BATCHES = BATCHES_PER_SEC * DURATION_S
INVALID = 0.1
DUPS = 0.1
CORRUPT = 0.1
DRAIN_GRACE_S = 45  # generous: shared host, cold parquet writers


def _expected_ground_truth() -> tuple[int, int, int]:
    """Replay every batch's seeds: (valid rows, invalid rows routed to
    dead letters, corrupted batch files)."""
    n_valid = n_invalid = n_corrupt = 0
    for i in range(TOTAL_BATCHES):
        factory = EventFactory(
            seed=1000 + i, invalid_schema_chance=INVALID, duplicate_chance=DUPS
        )
        batch = list(factory.create_random_events(BATCH_SIZE))
        ser = BatchSerializer(corruption_chance=CORRUPT, seed=1000 + i + 1)
        if len(json.dumps(batch)) // 2 == len(ser.serialize(batch)):
            n_corrupt += 1
            continue
        good = sum(1 for e in batch if "event_id" in e)
        n_valid += good
        n_invalid += BATCH_SIZE - good
    return n_valid, n_invalid, n_corrupt


def test_soak_sustained_reference_rates_x100(spark, tmp_path):
    in_dir = tmp_path / "in"
    in_dir.mkdir()

    produced = {"batches": 0}

    def run_producer() -> None:
        t0 = time.perf_counter()
        i = 0
        while i < TOTAL_BATCHES:
            target = min(int((time.perf_counter() - t0) * BATCHES_PER_SEC) + 1, TOTAL_BATCHES)
            while i < target:
                produce(
                    in_dir,
                    n_batches=1,
                    batch_size=BATCH_SIZE,
                    seed=1000 + i,
                    invalid_schema_chance=INVALID,
                    duplicate_chance=DUPS,
                    corruption_chance=CORRUPT,
                )
                i += 1
            produced["batches"] = i
            time.sleep(0.05)

    proc = StreamProcessor(
        schema=EVENT_SCHEMA,
        valid_sink=ParquetSink(str(tmp_path / "bronze")),
        dead_letter_sink=ParquetSink(str(tmp_path / "dead")),
        checkpoint_location=str(tmp_path / "ckpt"),
        trigger_interval="1 seconds",
    )
    progresses: dict[int, dict] = {}
    query = proc.start(text_file_stream(spark, str(in_dir)))
    producer = threading.Thread(target=run_producer, daemon=True)
    t_start = time.perf_counter()
    producer.start()
    try:
        # monitor while the producer paces out its 60 s of load
        while producer.is_alive():
            p = query.lastProgress
            if p is not None:
                progresses[p["batchId"]] = p
            time.sleep(0.25)
        producer.join()
        t_produced = time.perf_counter() - t_start
        query.processAllAvailable()
        t_drained = time.perf_counter() - t_start
        # recentProgress is Spark's own complete record of the last 100
        # micro-batches — it covers every drain-time batch, which the
        # 0.25 s lastProgress polling above cannot see once the producer
        # loop exits. On a contended host the production window may
        # yield only a handful of (stretched) micro-batches, with the
        # backlog clearing during the drain; without this merge the
        # loaded-batch sample collapses to the polled few and the
        # observation-count assert below flakes on host noise. Total
        # micro-batches stay far under the 100-entry retention (1 s
        # triggers over a <75 s window).
        for p in query.recentProgress:
            progresses[p["batchId"]] = p
        p = query.lastProgress
        if p is not None:
            progresses[p["batchId"]] = p
    finally:
        query.stop()

    # --- SLO: the consumer kept up with sustained input ---------------
    assert produced["batches"] == TOTAL_BATCHES
    # drains promptly once input stops: no unbounded backlog built up
    assert t_drained - t_produced < DRAIN_GRACE_S, (
        f"drain took {t_drained - t_produced:.1f}s after {t_produced:.1f}s of production"
    )
    loaded = [
        p
        for p in progresses.values()
        if p.get("numInputRows", 0) > 0 and p.get("processedRowsPerSecond")
    ]
    assert len(loaded) >= 10, f"only {len(loaded)} loaded micro-batches observed"
    keep_up = [
        p for p in loaded if p["processedRowsPerSecond"] >= p["inputRowsPerSecond"]
    ]
    # per-batch rates flap on a shared host; demand keep-up on the clear
    # majority of loaded batches AND on the aggregate
    assert len(keep_up) >= 0.6 * len(loaded), (
        f"{len(keep_up)}/{len(loaded)} micro-batches met "
        "processedRowsPerSecond >= inputRowsPerSecond"
    )
    # progress rows are SOURCE rows = one JSON-array line per batch file
    # (200 events each); convert to events/s for the SLO number. The
    # aggregate is STEADY-STATE throughput: the first loaded micro-batch
    # pays one-time parquet-writer init + codegen and is excluded here
    # (it still counts in the per-batch keep-up majority above) — at the
    # 28 s pacing window that cold batch otherwise weighs ~3% of the
    # total and turns session warm-up into an SLO flake.
    steady = sorted(loaded, key=lambda p: p["batchId"])[1:]
    total_rows = sum(p["numInputRows"] for p in steady)
    total_proc_s = sum(p["durationMs"]["triggerExecution"] for p in steady) / 1000.0
    agg_events_per_s = total_rows * BATCH_SIZE / total_proc_s
    assert agg_events_per_s >= BATCHES_PER_SEC * BATCH_SIZE, (
        f"aggregate processing rate {agg_events_per_s:.0f} events/s "
        f"< input rate {BATCHES_PER_SEC * BATCH_SIZE}"
    )

    # --- exact dead-letter accounting vs the deterministic replay -----
    n_valid, n_invalid, n_corrupt = _expected_ground_truth()
    bronze = spark.read.parquet(str(tmp_path / "bronze"))
    dead = spark.read.parquet(str(tmp_path / "dead"))
    assert bronze.count() == n_valid
    from pyspark.sql import functions as F

    reason_counts = {
        r["_dead_letter_reason"]: r["n"]
        for r in dead.groupBy("_dead_letter_reason").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert reason_counts.get("invalid_schema", 0) == n_invalid
    # one unparseable line per corrupted batch file
    assert reason_counts.get("corrupted_batch", 0) == n_corrupt

    # --- measured ratios sit at the injected rates --------------------
    assert abs(n_corrupt / TOTAL_BATCHES - CORRUPT) < 0.05
    events_in_clean_batches = (TOTAL_BATCHES - n_corrupt) * BATCH_SIZE
    assert abs(n_invalid / events_in_clean_batches - INVALID) < 0.02
