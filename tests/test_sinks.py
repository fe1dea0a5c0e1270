"""Sink-layer tests: partitioned parquet (the plain-parquet analogue of
the reference's Iceberg hidden day-partitioning) with partition pruning
at read, and the gated Iceberg create-or-evolve sink."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spark_streaming_practicum_spark.catalog import table
from spark_streaming_practicum_spark.streaming.sinks import (
    IcebergSink,
    ParquetSink,
    iceberg_available,
)

from .conftest import SF_DIR


def test_day_partitioned_sink_and_pruning(spark, tmp_path):
    """Write events day-partitioned (A19 analogue); a day-filtered read
    must prune partitions at planning time, not scan time."""
    out = str(tmp_path / "bronze")
    events = table(spark, SF_DIR, "events").withColumn(
        "event_date", F.to_date("ts")
    )
    ParquetSink(out, partition_columns=("event_date",)).write(events)

    # hive-style layout: one directory per day
    days = [p.name for p in (tmp_path / "bronze").iterdir() if p.name.startswith("event_date=")]
    assert len(days) >= 25  # ~30 days of data

    read = spark.read.parquet(out).filter(F.col("event_date") == "2024-01-05")
    plan = read._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        read._jdf.queryExecution(), "formatted"
    )
    assert "PartitionFilters" in plan
    n = read.count()
    full = spark.read.parquet(out).count()
    assert 0 < n < full


def test_append_mode_accumulates(spark, tmp_path):
    out = str(tmp_path / "acc")
    sink = ParquetSink(out)
    df = table(spark, SF_DIR, "region")
    sink.write(df)
    sink.write(df)
    assert spark.read.parquet(out).count() == 2 * df.count()


@pytest.mark.skipif(
    "not config.getoption('--run-iceberg', default=False)",
    reason="Iceberg runtime JARs not present in the harness (SURVEY.md §7); "
    "run with --run-iceberg on a cluster that has them",
)
def test_iceberg_create_then_evolve(spark, tmp_path):
    assert iceberg_available(spark)
    sink = IcebergSink(spark, "local.db.events", partition_day_column="ts")
    base = table(spark, SF_DIR, "events")
    sink.write(base)
    sink.write(base.withColumn("new_col", F.lit("x")))  # ADD COLUMN path
    assert "new_col" in spark.table("local.db.events").columns


def test_iceberg_availability_probe_is_safe(spark):
    # must never raise, whatever the classpath
    assert iceberg_available(spark) in (True, False)
