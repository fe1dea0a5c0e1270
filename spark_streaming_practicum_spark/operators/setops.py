"""Set operations (SURVEY.md §2C "Set ops").

UNION ALL is shuffle-free (plan-level union of children); UNION
DISTINCT / INTERSECT / EXCEPT each add one hash-distinct shuffle on the
full row — at 100 TB prefer pre-aggregated inputs, as modeled here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import query


def _active_custkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    return table(spark, sf_dir, "orders").select(F.col("o_custkey").alias("custkey"))


def _all_custkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    return table(spark, sf_dir, "customer").select(F.col("c_custkey").alias("custkey"))


@query(
    "set_union_all",
    oracle="""
    SELECT custkey, COUNT(*) AS n FROM (
        SELECT o_custkey AS custkey FROM orders
        UNION ALL
        SELECT c_custkey AS custkey FROM customer
    ) GROUP BY custkey
    """,
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL (bag union, no dedup shuffle), aggregated for stability."""
    u = _active_custkeys(spark, sf_dir).unionAll(_all_custkeys(spark, sf_dir))
    return u.groupBy("custkey").agg(F.count(F.lit(1)).alias("n"))


@query(
    "set_union_distinct",
    oracle="""
    SELECT o_custkey AS custkey FROM orders
    UNION
    SELECT c_custkey AS custkey FROM customer
    """,
)
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION with dedup (one hash-distinct exchange)."""
    return _active_custkeys(spark, sf_dir).union(_all_custkeys(spark, sf_dir)).distinct()


@query(
    "set_intersect",
    oracle="""
    SELECT c_custkey AS custkey FROM customer
    INTERSECT
    SELECT o_custkey AS custkey FROM orders
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct semantics) — customers that placed orders."""
    return _all_custkeys(spark, sf_dir).intersect(_active_custkeys(spark, sf_dir))


@query(
    "set_except",
    oracle="""
    SELECT c_custkey AS custkey FROM customer
    EXCEPT
    SELECT o_custkey AS custkey FROM orders
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct semantics) — customers that never ordered."""
    return _all_custkeys(spark, sf_dir).subtract(_active_custkeys(spark, sf_dir))


@query(
    "set_intersect_all",
    oracle="""
    SELECT l_suppkey AS k FROM lineitem WHERE l_returnflag = 'R'
    INTERSECT ALL
    SELECT l_suppkey AS k FROM lineitem WHERE l_returnflag = 'A'
    """,
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL (bag semantics, min-multiplicity)."""
    li = table(spark, sf_dir, "lineitem")
    r = li.filter(F.col("l_returnflag") == "R").select(F.col("l_suppkey").alias("k"))
    a = li.filter(F.col("l_returnflag") == "A").select(F.col("l_suppkey").alias("k"))
    return r.intersectAll(a)
