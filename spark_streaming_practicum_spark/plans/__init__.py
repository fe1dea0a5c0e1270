"""Plan inspection helpers — the feedback loop for scale tuning.

Used by tests to assert physical-plan properties that matter at 100 TB:
filters pushed to the parquet scan, broadcast joins where intended,
whole-stage codegen coverage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


def has_pushed_filters(df: DataFrame) -> bool:
    plan = formatted_plan(df)
    return "PushedFilters: [" in plan and "PushedFilters: []" not in plan


def broadcast_join_count(df: DataFrame) -> int:
    return formatted_plan(df).count("BroadcastHashJoin")


def sort_merge_join_count(df: DataFrame) -> int:
    return formatted_plan(df).count("SortMergeJoin")


def wholestage_codegen_spans(df: DataFrame) -> int:
    return formatted_plan(df).count("WholeStageCodegen")
