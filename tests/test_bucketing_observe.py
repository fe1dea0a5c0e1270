"""Bucketed-table co-located join (no shuffle) and observe()-based
metrics — the two scale disciplines SURVEY.md §4 calls out (bucketing
for 100 TB joins; observe() instead of extra count() jobs)."""

from __future__ import annotations

import re
import uuid

import pytest
from pyspark.sql import functions as F
from pyspark.sql.observation import Observation

from spark_streaming_practicum_spark.catalog import table

from .conftest import SF_DIR


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    """Two tables bucketed+sorted on the join key join with zero
    Exchange nodes — the write-once/join-many layout for fact-fact
    joins at scale."""
    suffix = uuid.uuid4().hex[:8]
    orders_t, lineitem_t = f"orders_b_{suffix}", f"lineitem_b_{suffix}"
    (
        table(spark, SF_DIR, "orders")
        .write.bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .mode("overwrite")
        .saveAsTable(orders_t)
    )
    (
        table(spark, SF_DIR, "lineitem")
        .write.bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .mode("overwrite")
        .saveAsTable(lineitem_t)
    )
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        o = spark.table(orders_t)
        li = spark.table(lineitem_t)
        joined = o.join(li, o.o_orderkey == li.l_orderkey).groupBy("o_orderpriority").count()
        joined.collect()
        plan = joined._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
        plan = plan.split("== Initial Plan ==")[0]  # judge the AQE final plan only
        n_exchanges = len(re.findall(r"Exchange hashpartitioning", plan))
        # join itself must be shuffle-free: the only exchange allowed is
        # the post-join aggregation's
        assert "SortMergeJoin" in plan
        assert n_exchanges <= 1, plan[:3000]
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql(f"DROP TABLE IF EXISTS {orders_t}")
        spark.sql(f"DROP TABLE IF EXISTS {lineitem_t}")


def test_observe_metrics_without_extra_job(spark):
    """df.observe() yields row/sum metrics as a side effect of the ONE
    action — replacing the reference's per-batch count() jobs
    (/root/reference/src/consumer/stream_processor.py:118-122)."""
    obs = Observation("io")
    df = (
        table(spark, SF_DIR, "orders")
        .observe(obs, F.count(F.lit(1)).alias("rows_in"), F.sum("o_totalprice").alias("sum_in"))
        .filter(F.col("o_totalprice") > 100000)
    )
    out_rows = df.count()
    n_orders = table(spark, SF_DIR, "orders").count()
    assert obs.get["rows_in"] == n_orders
    assert out_rows < n_orders
    assert obs.get["sum_in"] > 0
