"""Physical-plan assertions for the governance / spatial / ml packs:
the plan shapes that make these operators survive a 100x scale-up."""

from __future__ import annotations

import re

from spark_streaming_practicum_spark.plans import (
    broadcast_join_count,
    formatted_plan,
)
from spark_streaming_practicum_spark.registry import all_queries

from .conftest import SF_DIR

DEFS = all_queries()


def _scan_count(plan: str) -> int:
    # formatted explain lists each node twice (tree + "(n) Node" detail);
    # count only the numbered detail headers.
    return len(re.findall(r"^\(\d+\) Scan parquet", plan, flags=re.M))


def test_profile_table_stats_is_single_scan(spark):
    """The one-pass profiler must scan lineitem ONCE (Expand-based
    multi-distinct), not once per profiled column."""
    plan = formatted_plan(DEFS["profile_table_stats"].fn(spark, SF_DIR))
    assert _scan_count(plan) == 1, plan[:3000]
    assert "Expand" in plan  # the multi-distinct rewrite


def test_dq_checks_single_scan(spark):
    plan = formatted_plan(DEFS["dq_expectation_checks"].fn(spark, SF_DIR))
    assert _scan_count(plan) == 1, plan[:3000]


def test_geo_knn_broadcasts_replicated_small_side(spark):
    """The 9x-replicated supplier side must broadcast: the probe side
    (customers) never shuffles for the join itself."""
    df = DEFS["geo_grid_knn_join"].fn(spark, SF_DIR)
    assert broadcast_join_count(df) >= 1, formatted_plan(df)[:3000]
    # and never a cartesian product
    assert "Cartesian" not in formatted_plan(df)


def test_kmeans_assignment_broadcasts_centroids(spark):
    """Both Lloyd assignment steps must broadcast the k centroids —
    the n-vector side stays map-side for assignment."""
    plan = formatted_plan(DEFS["kmeans_lloyd_assignments"].fn(spark, SF_DIR))
    # k rows x n vectors: planned as BroadcastNestedLoopJoin BuildRight —
    # the centroid side ships to every executor, the vector side stays put.
    assert plan.count("BroadcastNestedLoopJoin Cross BuildRight") >= 2, plan[:3000]
    assert "CartesianProduct" not in plan


def test_cdc_diff_is_single_shuffle_per_side(spark):
    """Snapshot diff joins two filtered scans of the same table: one
    exchange per side on the join key, full-outer sort-merge join."""
    plan = formatted_plan(DEFS["cdc_snapshot_diff"].fn(spark, SF_DIR))
    assert "FullOuter" in plan, plan[:3000]
    # two snapshot sides -> at most two shuffle exchanges feeding the join
    pre_join = plan.split("SortMergeJoin")[0] if "SortMergeJoin" in plan else plan
    assert pre_join.count("Exchange hashpartitioning") <= 2, plan[:3000]


def test_incremental_refresh_keeps_decimal_until_output(spark):
    """The refresh path must not round-trip through double mid-plan —
    exactness of incremental == recompute depends on decimal adds."""
    df = DEFS["incremental_agg_refresh"].fn(spark, SF_DIR)
    plan = formatted_plan(df)
    assert "sum(d_sum" in plan or "decimal(38,6)" in plan, plan[:3000]
