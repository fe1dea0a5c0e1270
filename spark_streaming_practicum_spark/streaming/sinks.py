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


_ICEBERG_WIDENINGS = {
    ("int", "bigint"),
    ("float", "double"),
}


def plan_schema_evolution(
    table_name: str, current: T.StructType, incoming: T.StructType
) -> list[str]:
    """Pure diff->DDL planner for Iceberg schema evolution (no session).

    Mirrors the decision logic of the reference's
    _evolve_schema_if_needed (/root/reference/src/consumer/data_sinks.py:103-125):
    - a field present in the batch but not the table -> ADD COLUMN;
    - a field whose type differs -> ALTER COLUMN TYPE, but ONLY for
      Iceberg-legal widenings (int->bigint, float->double); narrowing or
      incompatible changes are never planned (the append would fail
      loudly rather than corrupt the table);
    - statements come out in batch-schema field order, so new columns
      land in arrival order (deterministic across retries).

    Split from execution so the planning is unit-testable without an
    Iceberg catalog on the classpath (this sandbox has none).
    """
    existing = {f.name: f for f in current.fields}
    ddl: list[str] = []
    for field in incoming.fields:
        ddl_type = field.dataType.simpleString()
        if field.name not in existing:
            ddl.append(f"ALTER TABLE {table_name} ADD COLUMN `{field.name}` {ddl_type}")
        else:
            have = existing[field.name].dataType.simpleString()
            if have != ddl_type and (have, ddl_type) in _ICEBERG_WIDENINGS:
                ddl.append(
                    f"ALTER TABLE {table_name} ALTER COLUMN `{field.name}` TYPE {ddl_type}"
                )
    return ddl


class IcebergSink:
    """Create-or-append Iceberg sink with online schema evolution.

    Parity with /root/reference/src/consumer/data_sinks.py:68-147:
    - ensure namespace (data_sinks.py:86-93);
    - first write creates the table, day-partitioned by the event
      timestamp (data_sinks.py:134-147);
    - later writes diff the batch schema against the table schema via
      plan_schema_evolution() and issue the planned DDL before appending
      (data_sinks.py:103-125).
    """

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
        current = self.spark.table(self.table_name).schema
        for stmt in plan_schema_evolution(self.table_name, current, batch_schema):
            self.spark.sql(stmt)

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
