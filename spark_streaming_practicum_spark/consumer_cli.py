"""Consumer entry point (reference parity: `python -m src.consumer`,
/root/reference/src/consumer/__main__.py).

Runs the streaming ingestion pipeline: text-file stream of JSON-array
batches -> parse/validate/route -> bronze parquet + dead-letter parquet,
with checkpointing and periodic progress logging.

    python -m spark_streaming_practicum_spark.consumer_cli \\
        --input /data/in --bronze /data/bronze \\
        --dead-letters /data/dead --checkpoint /data/ckpt \\
        --trigger-interval "30 seconds" [--once]
"""

from __future__ import annotations

import argparse
import logging

from pyspark.sql import types as T

from .session import build_session
from .sources.streaming import text_file_stream
from .streaming.processor import StreamProcessor
from .streaming.sinks import ParquetSink

# Production event schema (reference __main__.py:120-132 / FIXTURES.md §1)
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


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", required=True, help="directory of JSON-array batch files")
    p.add_argument("--bronze", required=True, help="valid-records parquet output dir")
    p.add_argument("--dead-letters", required=True, help="dead-letter parquet output dir")
    p.add_argument("--checkpoint", required=True, help="streaming checkpoint dir")
    p.add_argument("--trigger-interval", default="30 seconds")
    p.add_argument(
        "--partition-by-day",
        action="store_true",
        help="hive-partition bronze by event date (A19 analogue)",
    )
    p.add_argument(
        "--once",
        action="store_true",
        help="drain available input and exit (for tests/backfills)",
    )
    return p


def main(argv: list[str] | None = None) -> int:
    logging.basicConfig(level=logging.INFO)
    args = build_parser().parse_args(argv)
    spark = build_session(app_name="ssp-consumer")

    bronze = ParquetSink(
        args.bronze,
        partition_columns=("event_date",) if args.partition_by_day else (),
    )
    processor = StreamProcessor(
        schema=EVENT_SCHEMA,
        valid_sink=_with_day_column(bronze) if args.partition_by_day else bronze,
        dead_letter_sink=ParquetSink(args.dead_letters),
        checkpoint_location=args.checkpoint,
        trigger_interval=args.trigger_interval,
    )
    query = processor.start(text_file_stream(spark, args.input), available_now=args.once)
    try:
        if args.once:
            # Trigger.AvailableNow self-terminates after draining the
            # source (rate-limited micro-batches, checkpoint honored).
            query.awaitTermination()
        else:
            while query.isActive:  # progress loop (reference A27)
                query.awaitTermination(timeout=10)
                StreamProcessor.log_progress(query)
    except KeyboardInterrupt:  # graceful stop (reference A28)
        query.stop()
    return 0


class _with_day_column:
    """Wraps a partitioned sink, deriving the partition date column from
    the event timestamp just before write."""

    def __init__(self, sink: ParquetSink):
        self._sink = sink

    def write(self, batch) -> None:
        from pyspark.sql import functions as F

        self._sink.write(batch.withColumn("event_date", F.to_date("event_timestamp")))


if __name__ == "__main__":
    raise SystemExit(main())
