"""Validation + dead-letter routing (reference parity: A11-A14).

Re-expressed from /root/reference/src/consumer/stream_processor.py:66-129:
- required-field validation = every non-nullable schema field is non-null
  after the permissive parse (stream_processor.py:66-74);
- reason precedence corrupted_batch > invalid_schema > extra_fields
  (when-chain, stream_processor.py:76-95);
- valid rows drop the service columns (stream_processor.py:99-104);
- dead-letter rows put the reason first, then the raw record, then the
  (partially) parsed business columns (stream_processor.py:106-116).

Improvement over the reference (SURVEY.md §4 "double computation
hazard"): ``Router.split`` classifies once and returns two filtered
views of the SAME classified frame, so a caller that persists it runs
the parse lineage once, not four times.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .parser import HAS_EXTRA_FIELDS, IS_CORRUPTED, RAW_RECORD, SERVICE_COLUMNS


class DeadLetterReason:
    CORRUPTED_BATCH = "corrupted_batch"
    INVALID_SCHEMA = "invalid_schema"
    EXTRA_FIELDS = "extra_fields"


REASON = "_dead_letter_reason"


@dataclass
class RoutedBatch:
    valid: DataFrame
    dead_letters: DataFrame


class Router:
    """Splits parsed records into (valid, dead_letters)."""

    def __init__(self, schema: T.StructType):
        self.schema = schema

    def _required_fields_present(self) -> F.Column:
        required = [f.name for f in self.schema.fields if not f.nullable]
        return reduce(
            lambda acc, name: acc & F.col(name).isNotNull(),
            required,
            F.lit(True),
        )

    def classify(self, parsed: DataFrame) -> DataFrame:
        """Append the dead-letter reason column (null = valid)."""
        reason = (
            F.when(F.col(IS_CORRUPTED), DeadLetterReason.CORRUPTED_BATCH)
            .when(~self._required_fields_present(), DeadLetterReason.INVALID_SCHEMA)
            .when(F.col(HAS_EXTRA_FIELDS), DeadLetterReason.EXTRA_FIELDS)
            .otherwise(F.lit(None).cast("string"))
        )
        return parsed.withColumn(REASON, reason)

    def split(self, parsed: DataFrame) -> RoutedBatch:
        classified = self.classify(parsed)
        business_cols = [f.name for f in self.schema.fields]
        valid = (
            classified.filter(F.col(REASON).isNull())
            .drop(REASON, *SERVICE_COLUMNS)
        )
        dead = classified.filter(F.col(REASON).isNotNull()).select(
            REASON, RAW_RECORD, *business_cols
        )
        return RoutedBatch(valid=valid, dead_letters=dead)
