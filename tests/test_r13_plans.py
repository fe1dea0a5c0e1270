"""Round-13 optimization plan-shape pins.

Each test freezes the structural property a round-13 rework bought, so
a regression shows up as a plan diff rather than a silent slowdown.
"""

import re

from spark_streaming_practicum_spark.plans import formatted_plan
from spark_streaming_practicum_spark.registry import all_queries

from .conftest import SF_DIR

DEFS = all_queries()


def test_rfm_single_rank_pass(spark):
    """Round 13 melted the three quartile metrics into ONE ranking pass:
    the plan must carry exactly one range-partitioning exchange (the
    shared global_row_number call), not three — and still never a
    single-partition window."""
    df = DEFS["rfm_customer_segments"].fn(spark, SF_DIR)
    plan = formatted_plan(df)
    assert "SinglePartition" not in plan, plan[:3000]
    # One rank pass <=> every rangepartitioning orders by the melt
    # discriminator first. Pre-rework the plan ranged on the three
    # metric columns (last_order / frequency / monetary) separately.
    keys = set(re.findall(r"rangepartitioning\((\w+)#", plan))
    assert keys == {"mid"}, f"expected one melt-keyed rank pass, saw {keys}"


def test_ab_permutation_single_char_fold(spark):
    """Round 13 prefix-factored the replicate hashes: exactly ONE
    interpreted character-fold (the user-id digits) may survive in the
    plan — pre-rework each of the 50 replicates re-folded the prefixed
    string per referencing aggregate. The melt's explode must be
    present (narrow aggregate instead of the 201-buffer wide one)."""
    df = DEFS["ab_permutation_test"].fn(spark, SF_DIR)
    plan = formatted_plan(df)
    n_folds = len(re.findall(r"\baggregate\(split\(", plan))
    assert n_folds <= 1, f"expected <=1 char fold, saw {n_folds}"
    assert "Generate explode" in plan or "Expand" in plan or "explode" in plan, (
        "melt explode missing from plan"
    )
