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
