"""Edge-case robustness: empty inputs, unknown tables, degenerate
schemas, and the rate streaming source."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from spark_streaming_practicum_spark.catalog import table
from spark_streaming_practicum_spark.streaming.parser import JsonArrayBatchParser
from spark_streaming_practicum_spark.streaming.router import Router

from .conftest import SF_DIR


def test_unknown_table_raises_clean_error(spark):
    with pytest.raises(KeyError, match="unknown table"):
        table(spark, SF_DIR, "nonexistent")


def test_parser_empty_input(spark):
    schema = T.StructType([T.StructField("id", T.StringType(), False)])
    empty = spark.createDataFrame([], "value string")
    parsed = JsonArrayBatchParser(schema).parse(empty)
    routed = Router(schema).split(parsed)
    assert parsed.count() == 0
    assert routed.valid.count() == 0 and routed.dead_letters.count() == 0


def test_router_all_optional_schema_never_invalid(spark):
    # no required fields -> invalid_schema unreachable; extra-fields and
    # corruption still classified
    schema = T.StructType([T.StructField("id", T.StringType(), True)])
    df = spark.createDataFrame(
        [('[{"id": null}]',), ("broken [",), ('[{"id": "1", "e": "x"}]',)], ["value"]
    )
    routed = Router(schema).split(JsonArrayBatchParser(schema).parse(df))
    reasons = sorted(r["_dead_letter_reason"] for r in routed.dead_letters.collect())
    assert reasons == ["corrupted_batch", "extra_fields"]
    assert routed.valid.count() == 1  # the null-id record is valid


def test_rate_streaming_source_smoke(spark):
    """The built-in rate source drives a watermark-free agg — the load
    generator for streaming soak tests."""
    stream = spark.readStream.format("rate").option("rowsPerSecond", "100").load()
    agg = stream.groupBy().count()
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("rate_smoke")
        .trigger(processingTime="1 seconds")
        .start()
    )
    try:
        import time

        deadline = time.time() + 30
        n = 0
        while n == 0 and time.time() < deadline:
            time.sleep(1)
            rows = spark.sql("SELECT * FROM rate_smoke").collect()
            n = rows[0][0] if rows else 0
        assert n > 0
    finally:
        q.stop()
