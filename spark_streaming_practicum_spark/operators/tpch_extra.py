"""TPC-H-shaped relational depth pack (SURVEY.md §2C joins/aggs/subqueries).

Adaptations of classic TPC-H query shapes (Q4, Q12, Q14, Q16, Q19, Q22)
to the narrower testdata schema — each exercises a distinct plan shape
the relational core must get right at scale:

- Q4   correlated EXISTS      -> left-semi join with a non-equi conjunct
- Q12  conditional aggregation over a fact-fact join
- Q14  broadcast dim join + ratio-of-sums (single-row result)
- Q16  NOT IN subquery (null-safe anti join) + count distinct
- Q19  OR-of-ANDs predicate (disjunction pushdown / CNF handling)
- Q22  scalar subquery threshold + NOT EXISTS anti join

The reference delegates all querying to DuckDB (SURVEY.md §2B); these
belong to the Spark SQL surface our engine owns. Decimal-exact float
sums per functions/aggs.py keep oracle parity order-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..functions.aggs import dsum, dsum_sql
from ..registry import query

_REV = "l_extendedprice * (1 - l_discount)"


@query(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1997-01-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate)
    GROUP BY o_orderpriority
    """,
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: orders with at least one lineitem shipped after
    the order date, counted by priority. EXISTS becomes a LEFT SEMI join
    whose condition mixes the equi key with a non-equi date conjunct —
    the semi join dedups matches before the aggregate, so the fact table
    is never multiplied."""
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    l = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        o.join(
            l,
            (o.o_orderkey == l.l_orderkey) & (l.l_shipdate > o.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@query(
    "q12_priority_by_returnflag",
    oracle="""
    SELECT l.l_returnflag,
           SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS high_line_count,
           SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS low_line_count
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY l.l_returnflag
    """,
)
def q12_priority_by_returnflag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (shipmode -> returnflag): conditional counts over
    an orders⋈lineitem join. The lineitem date filter is pushed to the
    scan; the join shuffles both sides on orderkey (the layout the
    bucketing test shows how to make shuffle-free for recurring runs)."""
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    l = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(is_high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~is_high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@query(
    "q14_promo_revenue",
    oracle=f"""
    SELECT ROUND(100.0 * {dsum_sql(f"CASE WHEN p_type = 'PROMO' THEN {_REV} ELSE 0 END")}
                 / {dsum_sql(_REV)}, 4) AS promo_revenue_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-09-01'
      AND l_shipdate < TIMESTAMP '1996-10-01'
    """,
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: promotional revenue share for one month. Part is the
    small side -> broadcast hash join, fact scanned once with the date
    filter pushed down; the result is a single ratio row (all-reduce of
    two partial sums)."""
    l = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    p = table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .agg(F.round(100.0 * dsum(promo) / dsum(rev), 4).alias("promo_revenue_pct"))
    )


@query(
    "q16_supplier_cnt_by_part",
    oracle="""
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM part JOIN lineitem ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#5'
      AND p_type NOT IN ('PROMO', 'ECONOMY')
      AND p_size IN (1, 4, 9, 14, 19, 24, 29, 34)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    """,
)
def q16_supplier_cnt_by_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (lineitem stands in for partsupp): distinct
    supplier counts per part group, excluding suppliers from a NOT IN
    subquery (negative balance, the 'complaints' stand-in). NOT IN over
    a non-null key plans as a broadcast anti join; the distinct-count
    shuffles once on the group keys."""
    p = table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5")
        & (~F.col("p_type").isin("PROMO", "ECONOMY"))
        & (F.col("p_size").isin(1, 4, 9, 14, 19, 24, 29, 34))
    )
    l = table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    bad = table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        F.col("s_suppkey").alias("l_suppkey")
    )
    return (
        l.join(F.broadcast(bad), "l_suppkey", "left_anti")
        .join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "q19_discounted_revenue",
    oracle=f"""
    SELECT {dsum_sql(_REV)} AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 20
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#24' AND p_size BETWEEN 1 AND 25
           AND l_quantity BETWEEN 20 AND 30)
    """,
)
def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue under an OR-of-ANDs predicate spanning
    both join sides. Catalyst extracts the common join key and pushes
    the single-side conjuncts (brand/size to part's scan, quantity
    bounds to lineitem's) while keeping the cross-side disjunction as a
    post-join filter — the standard CNF treatment this query exists to
    exercise."""
    l = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 20)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#24")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(20, 30)
        )
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(dsum(rev).alias("revenue"))
    )


@query(
    "q22_idle_rich_customers",
    oracle="""
    SELECT c_mktsegment,
           COUNT(*) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE) AS totacctbal
    FROM customer c
    WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE)
                              / COUNT(*)
                       FROM customer WHERE c_acctbal > 0.0)
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '1999-01-01')
    GROUP BY c_mktsegment
    """,
)
def q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: above-average-balance customers with no order
    since 1999 (lapsed accounts), grouped by segment. The scalar AVG
    subquery is computed once (decimal-exact so the threshold is
    engine-independent) and broadcast into the filter; NOT EXISTS is a
    LEFT ANTI join against the filtered orders keys."""
    c = table(spark, sf_dir, "customer")
    threshold_df = c.filter(F.col("c_acctbal") > 0.0).agg(
        (dsum("c_acctbal") / F.count(F.lit(1))).alias("t")
    )
    threshold = threshold_df.collect()[0]["t"]  # scalar subquery: one tiny job
    o = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp"))
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return (
        c.filter(F.col("c_acctbal") > F.lit(threshold))
        .join(o, "c_custkey", "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(F.col("c_acctbal").cast("decimal(38,6)")).cast("double").alias("totacctbal"),
        )
    )
