"""Producer -> consumer integration: the reference's full system contract
(producer JSON-array files, at-least-once, unordered -> streaming
parse/validate/route -> bronze + dead letters), exercised deterministically."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import types as T

from spark_streaming_practicum_spark.producer import EventFactory, produce
from spark_streaming_practicum_spark.sources.streaming import text_file_stream
from spark_streaming_practicum_spark.streaming.processor import StreamProcessor
from spark_streaming_practicum_spark.streaming.sinks import ParquetSink

# The production event schema (FIXTURES.md §1 / reference __main__.py:120-132)
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


def test_factory_is_deterministic():
    a = list(EventFactory(seed=7).create_random_events(50))
    b = list(EventFactory(seed=7).create_random_events(50))
    assert a == b


def test_factory_event_shape():
    events = list(EventFactory(seed=1).create_random_events(200))
    for e in events:
        assert e["event_type"] in ("page_view", "purchase")
        if e["event_type"] == "purchase":
            assert "product_id" in e  # schema-evolution field
            assert e["properties"]["currency"] in ("USD", "EUR", "GBP")
        else:
            assert "product_id" not in e
            assert set(e["properties"]) == {"url", "user_agent"}


def test_duplicates_replay_previous_event():
    events = list(
        EventFactory(seed=3, duplicate_chance=0.5).create_random_events(100)
    )
    dup_count = sum(1 for i in range(1, len(events)) if events[i] == events[i - 1])
    assert dup_count > 10  # ~50% duplicate rate


def test_invalid_events_have_random_single_key():
    events = list(
        EventFactory(seed=5, invalid_schema_chance=1.0).create_random_events(10)
    )
    assert all(len(e) == 1 and "event_id" not in e for e in events)


def test_corruption_truncates_batches(tmp_path):
    paths = produce(tmp_path / "out", n_batches=20, batch_size=10, corruption_chance=1.0)
    for p in paths:
        with pytest.raises(json.JSONDecodeError):
            json.loads(p.read_text())


def test_producer_to_consumer_pipeline(spark, tmp_path):
    """Full system: faulty producer output -> streaming consumer ->
    bronze has exactly the valid events, dead letters the rest."""
    produce(
        tmp_path / "in",
        n_batches=8,
        batch_size=25,
        seed=11,
        invalid_schema_chance=0.1,
        duplicate_chance=0.1,
        corruption_chance=0.25,
    )
    # ground truth, replayed deterministically
    factory = EventFactory(seed=11, invalid_schema_chance=0.1, duplicate_chance=0.1)
    all_events = [list(factory.create_random_events(25)) for _ in range(8)]
    from spark_streaming_practicum_spark.producer import BatchSerializer

    ser = BatchSerializer(corruption_chance=0.25, seed=12)
    corrupted = [
        len(json.dumps(batch)) // 2 == len(ser.serialize(batch)) for batch in all_events
    ]
    n_valid_expected = sum(
        sum(1 for e in batch if "event_id" in e)
        for batch, c in zip(all_events, corrupted)
        if not c
    )

    proc = StreamProcessor(
        schema=EVENT_SCHEMA,
        valid_sink=ParquetSink(str(tmp_path / "bronze")),
        dead_letter_sink=ParquetSink(str(tmp_path / "dead")),
        checkpoint_location=str(tmp_path / "ckpt"),
        trigger_interval="1 seconds",
    )
    query = proc.start(text_file_stream(spark, str(tmp_path / "in")))
    try:
        query.processAllAvailable()
    finally:
        query.stop()

    bronze = spark.read.parquet(str(tmp_path / "bronze"))
    dead = spark.read.parquet(str(tmp_path / "dead"))
    assert bronze.count() == n_valid_expected
    # duplicates are NOT deduplicated at bronze (reference README.md:58-61)
    assert bronze.select("event_id").distinct().count() <= bronze.count()
    reasons = {r["_dead_letter_reason"] for r in dead.collect()}
    assert "corrupted_batch" in reasons and "invalid_schema" in reasons
    # valid rows carry the typed schema incl. evolved product_id
    assert dict(bronze.dtypes)["event_timestamp"] == "timestamp"
    assert "product_id" in bronze.columns


def test_ingestion_throughput_beats_reference_slo(spark, tmp_path):
    """The reference's implicit SLO is ~10 events/s sustained
    (BASELINE.md: 100-event batches every 10 s, 30 s trigger). The
    engine must beat that by orders of magnitude on the same single-node
    setup: 20k events through the full parse/validate/route + dual
    parquet sink path."""
    import time

    n_batches, batch_size = 100, 200
    produce(
        tmp_path / "in",
        n_batches=n_batches,
        batch_size=batch_size,
        seed=21,
        invalid_schema_chance=0.05,
        corruption_chance=0.05,
    )
    proc = StreamProcessor(
        schema=EVENT_SCHEMA,
        valid_sink=ParquetSink(str(tmp_path / "bronze")),
        dead_letter_sink=ParquetSink(str(tmp_path / "dead")),
        checkpoint_location=str(tmp_path / "ckpt"),
        trigger_interval="1 seconds",
    )
    start = time.perf_counter()
    query = proc.start(text_file_stream(spark, str(tmp_path / "in")))
    try:
        query.processAllAvailable()
    finally:
        query.stop()
    wall = time.perf_counter() - start
    events_per_sec = (n_batches * batch_size) / wall
    # reference steady state is 10 events/s; demand >= 50x even under
    # heavy co-tenant load (typical measured: 1000-3000 events/s)
    assert events_per_sec > 500, f"{events_per_sec:.0f} events/s"
