"""Batch sinks (reference parity: A16-A23).

Parquet append sinks are exact equivalents of the reference's
(/root/reference/src/consumer/data_sinks.py:23-65). The Iceberg
create-or-evolve sink (data_sinks.py:68-147) is re-expressed behind an
import/availability gate — the harness environment has no Iceberg
runtime JARs, and correctness must not depend on them (SURVEY.md §7).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T
from pyspark.sql.utils import AnalysisException


class ParquetSink:
    """Append-mode parquet sink, optionally hive-partitioned.

    Partitioning by a derived day column is the plain-parquet analogue of
    the reference's Iceberg hidden day-partitioning
    (/root/reference/src/consumer/__main__.py:115)."""

    def __init__(self, path: str, partition_columns: tuple[str, ...] = ()):
        self.path = path
        self.partition_columns = partition_columns

    def write(self, batch: DataFrame) -> None:
        writer = batch.write.mode("append").format("parquet")
        if self.partition_columns:
            writer = writer.partitionBy(*self.partition_columns)
        writer.save(self.path)


class IcebergSink:
    """Create-or-append Iceberg sink with online schema evolution.

    Parity with /root/reference/src/consumer/data_sinks.py:68-147:
    - ensure namespace (data_sinks.py:86-93);
    - first write creates the table, day-partitioned by the event
      timestamp (data_sinks.py:134-147);
    - later writes diff the batch schema against the table schema and
      issue ADD COLUMN / ALTER COLUMN TYPE DDL before appending
      (data_sinks.py:103-125); widening is limited to Iceberg-legal
      promotions (int->long, float->double).
    """

    _WIDENINGS = {
        ("int", "bigint"),
        ("float", "double"),
    }

    def __init__(self, spark: SparkSession, table_name: str, partition_day_column: str | None):
        self.spark = spark
        self.table_name = table_name
        self.partition_day_column = partition_day_column

    def _table_exists(self) -> bool:
        try:
            self.spark.table(self.table_name)
            return True
        except AnalysisException:
            return False

    def _ensure_namespace(self) -> None:
        parts = self.table_name.split(".")
        if len(parts) >= 2:
            namespace = ".".join(f"`{p}`" for p in parts[:-1])
            self.spark.sql(f"CREATE NAMESPACE IF NOT EXISTS {namespace}")

    def _evolve_schema(self, batch_schema: T.StructType) -> None:
        current = {f.name: f for f in self.spark.table(self.table_name).schema.fields}
        for field in batch_schema.fields:
            ddl_type = field.dataType.simpleString()
            if field.name not in current:
                self.spark.sql(
                    f"ALTER TABLE {self.table_name} ADD COLUMN `{field.name}` {ddl_type}"
                )
            else:
                existing = current[field.name].dataType.simpleString()
                if existing != ddl_type and (existing, ddl_type) in self._WIDENINGS:
                    self.spark.sql(
                        f"ALTER TABLE {self.table_name} "
                        f"ALTER COLUMN `{field.name}` TYPE {ddl_type}"
                    )

    def write(self, batch: DataFrame) -> None:
        if not self._table_exists():
            self._ensure_namespace()
            writer = batch.writeTo(self.table_name).using("iceberg")
            if self.partition_day_column:
                from pyspark.sql.functions import days

                writer = writer.partitionedBy(days(self.partition_day_column))
            writer.create()
        else:
            self._evolve_schema(batch.schema)
            batch.writeTo(self.table_name).append()


def iceberg_available(spark: SparkSession) -> bool:
    """True when an Iceberg catalog/runtime is on the classpath."""
    try:
        jvm = spark.sparkContext._jvm  # noqa: SLF001
        jvm.java.lang.Class.forName("org.apache.iceberg.catalog.Catalog")
        return True
    except Exception:
        return False
