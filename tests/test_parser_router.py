"""Unit tests for the parse/validate/route library — the reference's test
matrix (/root/reference/tests/consumer/test_batch_parsers.py:36-93 and
FIXTURES.md §2/§3) re-expressed against our parser + router."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from spark_streaming_practicum_spark.streaming.parser import (
    HAS_EXTRA_FIELDS,
    IS_CORRUPTED,
    RAW_RECORD,
    JsonArrayBatchParser,
)
from spark_streaming_practicum_spark.streaming.router import (
    REASON,
    DeadLetterReason,
    Router,
)

# Minimal two-required-field schema, as the reference's unit tests use
# (test_batch_parsers.py:19-27).
SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), nullable=False),
        T.StructField("name", T.StringType(), nullable=False),
    ]
)


@pytest.fixture()
def parser():
    return JsonArrayBatchParser(SCHEMA)


@pytest.fixture()
def router():
    return Router(SCHEMA)


def _batch_df(spark, *values: str):
    return spark.createDataFrame([(v,) for v in values], ["value"])


def test_valid_batch_parsed(spark, parser):
    df = _batch_df(spark, '[{"id": "1", "name": "a"}, {"id": "2", "name": "b"}]')
    rows = parser.parse(df).collect()
    assert len(rows) == 2
    assert {(r.id, r.name) for r in rows} == {("1", "a"), ("2", "b")}
    assert all(not r[IS_CORRUPTED] for r in rows)


def test_corrupted_batch_flagged_and_raw_preserved(spark, parser):
    raw = '[{"id": "1", "na'  # truncated mid-record
    rows = parser.parse(_batch_df(spark, raw)).collect()
    assert len(rows) == 1
    assert rows[0][IS_CORRUPTED] is True
    # corrupted rows keep the whole batch text as their record (A9)
    assert rows[0][RAW_RECORD] == raw
    assert rows[0].id is None and rows[0].name is None


def test_empty_array_is_corrupted(spark, parser):
    # explode_outer of an empty array -> one null row -> corrupted
    # (reference test_batch_parsers.py:84-93)
    rows = parser.parse(_batch_df(spark, "[]")).collect()
    assert len(rows) == 1
    assert rows[0][IS_CORRUPTED] is True


def test_extra_fields_flagged_by_key_count(spark, parser):
    df = _batch_df(spark, '[{"id": "1", "name": "a", "extra": "x"}]')
    rows = parser.parse(df).collect()
    assert rows[0][HAS_EXTRA_FIELDS] is True
    # fields themselves still parse
    assert rows[0].id == "1" and rows[0].name == "a"


def test_missing_plus_extra_passes_count_heuristic(spark, parser):
    # The deliberate imperfection (SURVEY.md §7): one missing + one extra
    # key keeps the count at the declared width -> NOT flagged.
    df = _batch_df(spark, '[{"id": "1", "bogus": "x"}]')
    rows = parser.parse(df).collect()
    assert rows[0][HAS_EXTRA_FIELDS] is False
    assert rows[0].name is None  # missing required field -> null


def test_missing_required_field_routed_invalid_schema(spark, parser, router):
    df = _batch_df(spark, '[{"id": "1"}]')
    routed = router.split(parser.parse(df))
    assert routed.valid.count() == 0
    dead = routed.dead_letters.collect()
    assert len(dead) == 1
    assert dead[0][REASON] == DeadLetterReason.INVALID_SCHEMA


def test_reason_precedence_corrupted_wins(spark, parser, router):
    # corrupted batch also fails required-field validation; reason must be
    # corrupted_batch (precedence per stream_processor.py:76-95)
    routed = router.split(parser.parse(_batch_df(spark, "not json [")))
    dead = routed.dead_letters.collect()
    assert dead[0][REASON] == DeadLetterReason.CORRUPTED_BATCH


def test_valid_rows_drop_service_columns(spark, parser, router):
    df = _batch_df(spark, '[{"id": "1", "name": "a"}]')
    routed = router.split(parser.parse(df))
    assert routed.valid.columns == ["id", "name"]


def test_dead_letter_column_order(spark, parser, router):
    df = _batch_df(spark, '[{"id": "1", "extra": "x", "name": "a", "more": "y"}]')
    routed = router.split(parser.parse(df))
    # reason first, raw record second, then business columns
    assert routed.dead_letters.columns == [REASON, RAW_RECORD, "id", "name"]
    assert routed.dead_letters.collect()[0][REASON] == DeadLetterReason.EXTRA_FIELDS


def test_mixed_batch_splits_row_wise(spark, parser, router):
    df = _batch_df(
        spark,
        '[{"id": "1", "name": "a"}, {"id": "2"}, {"id": "3", "name": "c", "e": "x"}]',
    )
    routed = router.split(parser.parse(df))
    assert routed.valid.count() == 1
    reasons = sorted(r[REASON] for r in routed.dead_letters.collect())
    assert reasons == [DeadLetterReason.EXTRA_FIELDS, DeadLetterReason.INVALID_SCHEMA]
