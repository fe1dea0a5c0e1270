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

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
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


def register(spark) -> None:
    spark.dataSource.register(SyntheticEventsDataSource)
