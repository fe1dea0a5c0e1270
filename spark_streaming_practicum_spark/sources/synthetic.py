"""Custom Python data source (Spark 4 DataSource API): the producer's
event generator exposed as ``spark.read.format("synthetic_events")``.

Turns the reference's external producer process (A29-A31) into a
first-class, partition-parallel Spark source: each input partition runs
an independently-seeded EventFactory, so generation scales with the
cluster instead of a single writer process. Deterministic for a given
(seed, numPartitions, rowsPerPartition).
"""

from __future__ import annotations

import json
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)
from pyspark.sql.types import (
    MapType,
    StringType,
    StructField,
    StructType,
)

EVENT_SOURCE_SCHEMA = StructType(
    [
        # nullable: invalid-schema events (A30) lack the business fields
        StructField("user_id", StringType(), True),
        StructField("event_id", StringType(), True),
        StructField("event_timestamp", StringType(), True),
        StructField("event_type", StringType(), True),
        StructField("product_id", StringType(), True),
        StructField("properties", MapType(StringType(), StringType()), True),
        StructField("is_valid", StringType(), False),
    ]
)


class _EventPartition(InputPartition):
    def __init__(self, index: int, seed: int, rows: int, invalid_chance: float):
        self.index = index
        self.seed = seed
        self.rows = rows
        self.invalid_chance = invalid_chance


class SyntheticEventsReader(DataSourceReader):
    def __init__(self, options: dict):
        self.num_partitions = int(options.get("numPartitions", 4))
        self.rows_per_partition = int(options.get("rowsPerPartition", 100))
        self.seed = int(options.get("seed", 42))
        self.invalid_chance = float(options.get("invalidChance", 0.0))

    def partitions(self):
        return [
            _EventPartition(
                i, self.seed + i, self.rows_per_partition, self.invalid_chance
            )
            for i in range(self.num_partitions)
        ]

    def read(self, partition: _EventPartition) -> Iterator[tuple]:
        # import inside the task: workers deserialize this reader standalone
        from spark_streaming_practicum_spark.producer import EventFactory

        factory = EventFactory(
            seed=partition.seed, invalid_schema_chance=partition.invalid_chance
        )
        for event in factory.create_random_events(partition.rows):
            valid = "event_id" in event
            yield (
                event.get("user_id"),
                event.get("event_id", json.dumps(event)),
                event.get("event_timestamp", ""),
                event.get("event_type", "invalid"),
                event.get("product_id"),
                event.get("properties"),
                "y" if valid else "n",
            )


class SyntheticEventsDataSource(DataSource):
    """``spark.read.format("synthetic_events").option(...)`` source."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> StructType:
        return EVENT_SOURCE_SCHEMA

    def reader(self, schema: StructType) -> SyntheticEventsReader:
        return SyntheticEventsReader(self.options)

    def streamReader(self, schema: StructType) -> "SyntheticEventsStreamReader":
        return SyntheticEventsStreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(SyntheticEventsDataSource)


# --- Python DataSink (Spark 4 DataSource write path) -----------------------
#
# The write-side counterpart of the reader above, and the first-class
# version of the reference producer's local-dir sink
# (/root/reference/src/producer/data_sinks.py): each task streams its
# partition to one JSON-lines file, returns a commit message, and the
# driver publishes a _SUCCESS manifest only when EVERY task committed —
# the all-or-nothing contract a bare foreachPartition writer lacks.


class _JsonLinesCommit(WriterCommitMessage):
    def __init__(self, path: str, rows: int):
        self.path = path
        self.rows = rows


class JsonLinesWriter(DataSourceWriter):
    def __init__(self, options: dict, schema: StructType):
        self.path = options["path"]
        self.columns = [f.name for f in schema.fields]

    def write(self, iterator) -> _JsonLinesCommit:
        import os

        from pyspark import TaskContext

        ctx = TaskContext.get()
        os.makedirs(self.path, exist_ok=True)
        # attempt number in the name: a retried task never half-overwrites
        # a committed file, and only committed paths reach the manifest
        out = os.path.join(
            self.path, f"part-{ctx.partitionId():05d}-{ctx.attemptNumber()}.jsonl"
        )
        n = 0
        with open(out, "w", encoding="utf-8") as fh:
            for row in iterator:
                fh.write(json.dumps(dict(zip(self.columns, row)), default=str))
                fh.write("\n")
                n += 1
        return _JsonLinesCommit(out, n)

    def commit(self, messages) -> None:
        import os

        manifest = {
            "files": sorted(m.path for m in messages),
            "rows": sum(m.rows for m in messages),
        }
        with open(os.path.join(self.path, "_MANIFEST.json"), "w") as fh:
            json.dump(manifest, fh)
        with open(os.path.join(self.path, "_SUCCESS"), "w") as fh:
            fh.write("")

    def abort(self, messages) -> None:
        import os

        for m in messages:
            if m is not None and os.path.exists(m.path):
                os.remove(m.path)


class JsonLinesDataSource(DataSource):
    """``df.write.format("jsonl_dir").option("path", ...)`` sink."""

    @classmethod
    def name(cls) -> str:
        return "jsonl_dir"

    def writer(self, schema: StructType, overwrite: bool) -> JsonLinesWriter:
        return JsonLinesWriter(self.options, schema)


def register_sink(spark) -> None:
    spark.dataSource.register(JsonLinesDataSource)


# --- Python streaming DataSource (Spark 4 DataSourceStreamReader) -----------

# The STREAMING read path of the same producer: offsets are global row
# indices, each micro-batch advances by rowsPerBatch, and partitions()
# splits the [start, end) row range across numPartitions so generation
# stays executor-parallel (the full DataSourceStreamReader, not the
# driver-side SimpleDataSourceStreamReader — at production rates the
# driver must plan partitions, never materialize rows).
#
# Determinism/replay contract: a partition's content is a pure function
# of (seed, row range) — failure recovery re-plans the same ranges and
# regenerates identical rows, giving exactly-once output with any
# idempotent sink, mirroring the reference producer's seeded replay.


class _EventRangePartition(InputPartition):
    def __init__(self, start: int, end: int, seed: int, invalid_chance: float):
        self.start = start
        self.end = end
        self.seed = seed
        self.invalid_chance = invalid_chance


class SyntheticEventsStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict):
        self.num_partitions = int(options.get("numPartitions", 4))
        self.rows_per_batch = int(options.get("rowsPerBatch", 100))
        self.max_rows = int(options.get("maxRows", 10**9))
        self.seed = int(options.get("seed", 42))
        self.invalid_chance = float(options.get("invalidChance", 0.0))

    def initialOffset(self) -> dict:
        return {"row": 0}

    def latestOffset(self) -> dict:
        # each call (one per micro-batch) admits one more batch of rows;
        # capped so bounded tests drain to an exact total
        self._latest = min(
            getattr(self, "_latest", 0) + self.rows_per_batch, self.max_rows
        )
        return {"row": self._latest}

    def partitions(self, start: dict, end: dict):
        lo, hi = int(start["row"]), int(end["row"])
        n = max(self.num_partitions, 1)
        span = (hi - lo + n - 1) // n or 1
        parts = []
        while lo < hi:
            parts.append(
                _EventRangePartition(
                    lo, min(lo + span, hi), self.seed, self.invalid_chance
                )
            )
            lo += span
        return parts or [
            _EventRangePartition(hi, hi, self.seed, self.invalid_chance)
        ]

    def read(self, partition: _EventRangePartition) -> Iterator[tuple]:
        from spark_streaming_practicum_spark.producer import EventFactory

        factory = EventFactory(
            seed=partition.seed + partition.start,
            invalid_schema_chance=partition.invalid_chance,
        )
        for event in factory.create_random_events(partition.end - partition.start):
            valid = "event_id" in event
            yield (
                event.get("user_id"),
                event.get("event_id", json.dumps(event)),
                event.get("event_timestamp", ""),
                event.get("event_type", "invalid"),
                event.get("product_id"),
                event.get("properties"),
                "y" if valid else "n",
            )

    def commit(self, end: dict) -> None:
        pass

    def stop(self) -> None:
        pass
