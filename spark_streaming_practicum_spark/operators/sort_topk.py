"""Sort / limit / top-k operators (SURVEY.md §2C "Sort/limit/top-k").

Every LIMIT carries a total ORDER BY (ties broken by key columns) so the
result set is deterministic. Spark plans ``orderBy().limit(k)`` as
TakeOrderedAndProject — a per-partition heap + driver merge, no global
sort — which is exactly the 100 TB-safe shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import query


@query(
    "topk_global",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_extendedprice
    FROM lineitem
    ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC
    LIMIT 20
    """,
)
def topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-20 by price (TakeOrdered, not a full sort)."""
    return (
        table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(
            F.col("l_extendedprice").desc(),
            F.col("l_orderkey").asc(),
            F.col("l_linenumber").asc(),
        )
        .limit(20)
    )


@query(
    "sort_multi_key_nulls",
    oracle="""
    SELECT o_orderkey, o_orderpriority,
           NULLIF(o_orderstatus, 'O') AS status_or_null,
           o_totalprice
    FROM orders
    ORDER BY status_or_null ASC NULLS FIRST,
             o_orderpriority DESC,
             o_totalprice DESC,
             o_orderkey ASC
    LIMIT 100
    """,
)
def sort_multi_key_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key sort with explicit NULLS FIRST placement on a computed
    nullable key."""
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.nullif(F.col("o_orderstatus"), F.lit("O")).alias("status_or_null"),
        "o_totalprice",
    )
    return o.orderBy(
        F.col("status_or_null").asc_nulls_first(),
        F.col("o_orderpriority").desc(),
        F.col("o_totalprice").desc(),
        F.col("o_orderkey").asc(),
    ).limit(100)


@query(
    "sort_global_full",
    oracle="""
    SELECT r_regionkey, r_name FROM region ORDER BY r_name DESC
    """,
)
def sort_global_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full global sort (range-partitioned exchange) — demonstrated on a
    dim table; at fact scale prefer topk_global / repartitionByRange."""
    return table(spark, sf_dir, "region").orderBy(F.col("r_name").desc())


@query(
    "limit_scan",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    ORDER BY c_custkey ASC LIMIT 10
    """,
)
def limit_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B1 parity: `SELECT * FROM t LIMIT n` made deterministic with a key
    ordering (reference demo: /root/reference/demos/duckdb.tape:13-18)."""
    return (
        table(spark, sf_dir, "customer")
        .select("c_custkey", "c_name")
        .orderBy(F.col("c_custkey").asc())
        .limit(10)
    )
