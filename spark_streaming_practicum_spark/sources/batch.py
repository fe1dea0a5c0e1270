"""Batch sources (reference A3/A4 read side, generalized).

Thin declarative wrappers — the value is in what they DON'T do: no
inferSchema on production paths, explicit schemas so scans prune columns
and push filters from the first query."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def read_csv(
    spark: SparkSession, path: str, schema: T.StructType, header: bool = True
) -> DataFrame:
    return spark.read.schema(schema).csv(path, header=header)


def read_json(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    return spark.read.schema(schema).json(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan — same vectorized/pushdown treatment as parquet in Spark
    (PushedFilters + column pruning), for corpora stored in ORC."""
    return spark.read.orc(path)
