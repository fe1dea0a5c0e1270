"""Round-12 optimization guard: the mono-id local index inside the
two-pass global ranking must be bit-equivalent to a reference
``row_number()`` window, for both the eager and the new lazy helper,
and the plans must stay free of the shapes the rework removed/avoids
(full-width hashpartitioning(_pid) exchange; Exchange SinglePartition).
"""

from __future__ import annotations

import re

from pyspark.sql import Window
from pyspark.sql import functions as F

from spark_streaming_practicum_spark.catalog import table
from spark_streaming_practicum_spark.functions.ranks import (
    global_row_number,
    global_row_number_lazy,
    release_persisted_frames,
)
from spark_streaming_practicum_spark.plans import formatted_plan

from .conftest import SF_DIR


def _base(spark):
    return table(spark, SF_DIR, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_extendedprice").alias("y"),
        F.col("l_quantity").alias("x"),
    )


_ORDER_COLS = ["y", "l_orderkey", "l_linenumber", "x"]


def _rank_map(df, rn_col):
    """(full row values) -> sorted list of assigned ranks."""
    out: dict = {}
    for r in df.collect():
        key = tuple(r[c] for c in _ORDER_COLS)
        out.setdefault(key, []).append(r[rn_col])
    return {k: sorted(v) for k, v in out.items()}


def test_mono_id_rank_matches_reference_window(spark):
    base = _base(spark)
    order = [F.col(c).asc() for c in _ORDER_COLS]
    ref = base.withColumn("rn", F.row_number().over(Window.orderBy(*order)))
    expected = _rank_map(ref, "rn")

    eager, n = global_row_number(base, order, rn_name="rn")
    assert _rank_map(eager, "rn") == expected
    assert n == sum(len(v) for v in expected.values())
    release_persisted_frames()

    lazy = global_row_number_lazy(base, order, rn_name="rn")
    assert _rank_map(lazy, "rn") == expected


def test_rank_plans_avoid_removed_shapes(spark):
    base = _base(spark)
    order = [F.col(c).asc() for c in _ORDER_COLS]

    eager, _ = global_row_number(base, order, rn_name="rn")
    eager_plan = formatted_plan(eager)
    # the rework's point: the rank needs no Window operator at all, so
    # the old full-width hashpartitioning(_pid) exchange feeding it is
    # gone (the lazy variant still hash-aggregates the TINY ≤P-row
    # count frame by _pid — that exchange carries P rows, not data)
    assert "Window" not in eager_plan, eager_plan[:3000]
    release_persisted_frames()

    lazy = global_row_number_lazy(base, order, rn_name="rn")
    lazy_plan = formatted_plan(lazy)
    assert "Window" not in lazy_plan, lazy_plan[:3000]
    assert "SinglePartition" not in lazy_plan, lazy_plan[:3000]
    # offsets must ride broadcasts, and the local index must sit above
    # an in-partition sort of a range exchange
    assert "BroadcastHashJoin" in lazy_plan
    assert "monotonically_increasing_id" in lazy_plan
    assert "rangepartitioning" in lazy_plan


def test_lazy_rank_project_stays_above_sort(spark):
    """If Catalyst ever pushed the mono-id projection below the
    in-partition sort, local indices would be assigned in pre-sort
    order and every rank would be garbage. Pin the operator order:
    in the formatted plan tree the Project carrying
    monotonically_increasing_id appears ABOVE (before) the Sort."""
    base = _base(spark)
    order = [F.col(c).asc() for c in _ORDER_COLS]
    lazy = global_row_number_lazy(base, order, rn_name="rn")
    plan = formatted_plan(lazy)
    tree = plan.split("(1) ")[0]
    proj_lines = [
        i for i, l in enumerate(tree.splitlines()) if re.search(r"\bProject\b", l)
    ]
    sort_lines = [
        i for i, l in enumerate(tree.splitlines()) if re.search(r"\bSort\b", l)
    ]
    assert proj_lines and sort_lines
    assert min(proj_lines) < max(sort_lines)
