"""Maintenance (compaction), skew (salted join), and plain-parquet
schema evolution (mergeSchema) — the operational toolkit around the
sinks."""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import functions as F

from spark_streaming_practicum_spark.catalog import table
from spark_streaming_practicum_spark.functions.skew import salted_join
from spark_streaming_practicum_spark.streaming.maintenance import compact_parquet

from .conftest import SF_DIR


def test_compaction_reduces_file_count_preserving_rows(spark, tmp_path):
    out = tmp_path / "many"
    src = table(spark, SF_DIR, "orders")
    # simulate micro-batch fragmentation: 40 small files
    src.repartition(40).write.mode("overwrite").parquet(str(out))
    before_files = len(list(Path(out).glob("*.parquet")))
    before_rows = spark.read.parquet(str(out)).count()
    assert before_files == 40

    after_files = compact_parquet(spark, str(out), target_file_bytes=64 * 1024 * 1024)
    assert after_files < before_files
    assert spark.read.parquet(str(out)).count() == before_rows


def test_salted_join_matches_plain_join(spark):
    """Salting must not change results — only the shuffle layout."""
    c = table(spark, SF_DIR, "customer")
    o = table(spark, SF_DIR, "orders")
    plain = (
        c.join(o, c.c_custkey == o.o_custkey)
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    salted = (
        salted_join(o, c, F.col("c_custkey") == F.col("o_custkey"), n_salts=8)
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_parquet_merge_schema_evolution(spark, tmp_path):
    """Plain-parquet schema evolution (the mergeSchema half of A22: the
    Iceberg sink does explicit DDL; parquet readers merge footers)."""
    out = str(tmp_path / "evolving")
    v1 = spark.createDataFrame([(1, "a")], ["id", "name"])
    v1.write.mode("append").parquet(out)
    v2 = spark.createDataFrame([(2, "b", "p-9")], ["id", "name", "product_id"])
    v2.write.mode("append").parquet(out)

    merged = spark.read.option("mergeSchema", "true").parquet(out)
    assert set(merged.columns) == {"id", "name", "product_id"}
    rows = {r.id: r.product_id for r in merged.collect()}
    assert rows[1] is None and rows[2] == "p-9"
