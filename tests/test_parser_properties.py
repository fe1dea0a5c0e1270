"""Property-based tests (hypothesis) for the batch parser — randomized
coverage the reference's example-based suite lacks (SURVEY.md §5:
"Property/randomized: None")."""

from __future__ import annotations

import json

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from spark_streaming_practicum_spark.streaming.parser import (
    IS_CORRUPTED,
    JsonArrayBatchParser,
)
from spark_streaming_practicum_spark.streaming.router import REASON, Router

SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), nullable=False),
        T.StructField("name", T.StringType(), nullable=False),
    ]
)

# printable, JSON-safe strings
text = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126), min_size=0, max_size=20
)
valid_record = st.fixed_dictionaries({"id": text, "name": text})
extra_record = st.fixed_dictionaries({"id": text, "name": text, "zz": text})
invalid_record = st.dictionaries(
    st.text(alphabet="abcdef", min_size=1, max_size=5).filter(
        lambda k: k not in ("id", "name")
    ),
    text,
    min_size=1,
    max_size=1,
)
record = st.one_of(valid_record, extra_record, invalid_record)
batch = st.lists(record, min_size=1, max_size=6)

_SETTINGS = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(batches=st.lists(batch, min_size=1, max_size=4))
@_SETTINGS
def test_row_conservation_and_classification(spark, batches):
    """Every record of every parsable batch yields exactly one output
    row, classified consistently with its shape."""
    df = spark.createDataFrame([(json.dumps(b),) for b in batches], ["value"])
    parsed = JsonArrayBatchParser(SCHEMA).parse(df)
    routed = Router(SCHEMA).split(parsed)
    out_rows = parsed.count()
    assert out_rows == sum(len(b) for b in batches)
    assert not any(r[IS_CORRUPTED] for r in parsed.collect())

    n_valid_expected = sum(
        1 for b in batches for r in b if set(r) == {"id", "name"}
    )
    assert routed.valid.count() == n_valid_expected
    for r in routed.dead_letters.collect():
        assert r[REASON] in ("invalid_schema", "extra_fields")


@given(b=batch, cut=st.floats(min_value=0.1, max_value=0.9))
@_SETTINGS
def test_truncated_batches_always_route_corrupted(spark, b, cut):
    """Any mid-string truncation of a JSON array is either unparsable
    (-> corrupted_batch, raw preserved) — never silently dropped."""
    payload = json.dumps(b)
    truncated = payload[: max(1, int(len(payload) * cut))]
    if truncated == payload:
        return
    df = spark.createDataFrame([(truncated,)], ["value"])
    parsed = JsonArrayBatchParser(SCHEMA).parse(df)
    rows = parsed.collect()
    try:
        json.loads(truncated)
        parsable = True
    except json.JSONDecodeError:
        parsable = False
    if not parsable:
        assert len(rows) == 1 and rows[0][IS_CORRUPTED]
        assert rows[0]["_raw_record"] == truncated
