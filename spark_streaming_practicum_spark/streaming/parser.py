"""JSON-array batch parsing (reference parity: operators A5-A10).

Semantics re-expressed from /root/reference/src/consumer/batch_parsers.py
(cited per step below) as a *pure batch* DataFrame transform, so the same
code path is unit-testable, oracle-checkable, and wrappable by a
streaming query.

The service-column convention (the pipeline's IR — SURVEY.md §1.4):

    _raw_batch          whole-batch input string (dropped on output)
    _raw_record         individual record string; corrupted batches are
                        backfilled with the batch text
    _is_corrupted_batch explode/parse failure flag
    _has_extra_fields   key-count heuristic flag
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

RAW_BATCH = "_raw_batch"
RAW_RECORD = "_raw_record"
IS_CORRUPTED = "_is_corrupted_batch"
HAS_EXTRA_FIELDS = "_has_extra_fields"
PARSED = "_parsed_record"

SERVICE_COLUMNS = (RAW_RECORD, IS_CORRUPTED, HAS_EXTRA_FIELDS)


class JsonArrayBatchParser:
    """Parses one-JSON-array-per-row batches into typed records.

    Parity notes (reference file:line):
    - explode_outer(from_json(.., array<string>)) so unparsable or empty
      batches yield exactly one null-record row
      (batch_parsers.py:121-142, test_batch_parsers.py:84-93);
    - extra-field detection is the reference's *count-based* heuristic —
      re-parse the record as map<string,string> and compare key count to
      the declared field count (batch_parsers.py:64-76). Deliberately
      imperfect (a record with one missing + one extra key passes);
      parity requires keeping it, per SURVEY.md §7;
    - corrupted rows keep the batch text as their record via coalesce
      (batch_parsers.py:77-84);
    - permissive from_json: mismatched fields come back null
      (batch_parsers.py:134-141).
    """

    def __init__(self, schema: T.StructType, json_options: dict[str, str] | None = None):
        self.schema = schema
        self.json_options = dict(json_options or {})

    def parse(self, batches: DataFrame, value_column: str = "value") -> DataFrame:
        declared_field_count = len(self.schema.fields)

        records = batches.select(
            F.col(value_column).alias(RAW_BATCH)
        ).select(
            RAW_BATCH,
            F.explode_outer(
                F.from_json(F.col(RAW_BATCH), T.ArrayType(T.StringType()))
            ).alias(RAW_RECORD),
        )

        flagged = records.select(
            RAW_BATCH,
            RAW_RECORD,
            F.col(RAW_RECORD).isNull().alias(IS_CORRUPTED),
            (
                F.size(
                    F.map_keys(
                        F.from_json(F.col(RAW_RECORD), T.MapType(T.StringType(), T.StringType()))
                    )
                )
                > F.lit(declared_field_count)
            ).alias(HAS_EXTRA_FIELDS),
        ).withColumn(RAW_RECORD, F.coalesce(F.col(RAW_RECORD), F.col(RAW_BATCH)))

        parsed = flagged.withColumn(
            PARSED, F.from_json(F.col(RAW_RECORD), self.schema, self.json_options)
        )

        return parsed.select(
            RAW_RECORD,
            IS_CORRUPTED,
            HAS_EXTRA_FIELDS,
            *[F.col(f"{PARSED}.{field.name}").alias(field.name) for field in self.schema.fields],
        )
