"""TPC-H-shaped relational depth pack (SURVEY.md §2C joins/aggs/subqueries).

Adaptations of classic TPC-H query shapes (Q4, Q11, Q12, Q14, Q15, Q16,
Q17, Q19, Q21, Q22) to the narrower testdata schema — each exercises a
distinct plan shape the relational core must get right at scale:

- Q4   correlated EXISTS      -> left-semi join with a non-equi conjunct
- Q11  HAVING against a global scalar subquery over the same scan
- Q12  conditional aggregation over a fact-fact join
- Q14  broadcast dim join + ratio-of-sums (single-row result)
- Q15  aggregate filtered by equality with its own MAX (exact doubles)
- Q16  NOT IN subquery (null-safe anti join) + count distinct
- Q17  correlated AVG subquery, decorrelated to per-key agg + join
- Q19  OR-of-ANDs predicate (disjunction pushdown / CNF handling)
- Q21  semi + anti joins with inequality conjuncts over a shared subtree
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


@query(
    "q11_important_parts",
    oracle=f"""
    WITH pr AS (SELECT l_partkey, {dsum_sql(_REV)} AS value
                FROM lineitem GROUP BY l_partkey)
    SELECT l_partkey, value
    FROM pr
    WHERE value > (SELECT 0.0002 * {dsum_sql(_REV)} FROM lineitem)
    """,
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose revenue exceeds a fraction of TOTAL
    revenue — a HAVING against a global scalar subquery. Both aggregates
    share one scan lineage; the threshold is a one-row broadcast. The
    decimal-exact sums make the > comparison engine-independent."""
    l = table(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    pr = l.groupBy("l_partkey").agg(dsum(rev).alias("value"))
    total = l.agg((0.0002 * dsum(rev)).alias("t")).collect()[0]["t"]
    return pr.filter(F.col("value") > F.lit(total))


@query(
    "q15_top_supplier",
    oracle=f"""
    WITH r AS (SELECT l_suppkey, {dsum_sql(_REV)} AS total_rev
               FROM lineitem
               WHERE l_shipdate >= TIMESTAMP '1996-01-01'
                 AND l_shipdate < TIMESTAMP '1996-04-01'
               GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, total_rev
    FROM supplier JOIN r ON s_suppkey = l_suppkey
    WHERE total_rev = (SELECT MAX(total_rev) FROM r)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: the supplier(s) with maximum quarterly revenue —
    aggregate, then equality against the aggregate's own MAX (exact,
    because revenue is decimal-summed identically on both engines).
    The revenue table is computed once and reused for both sides."""
    l = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    r = l.groupBy("l_suppkey").agg(dsum(rev).alias("total_rev")).persist()
    best = r.agg(F.max("total_rev").alias("m")).collect()[0]["m"]
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        r.filter(F.col("total_rev") == F.lit(best))
        .join(s, r.l_suppkey == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_rev")
    )


@query(
    "q17_small_quantity_revenue",
    oracle=f"""
    WITH pa AS (SELECT l_partkey,
                       0.2 * ({dsum_sql("l_quantity")} / COUNT(l_quantity)) AS qty_thresh
                FROM lineitem GROUP BY l_partkey)
    SELECT ROUND({dsum_sql("l_extendedprice")} / 7.0, 2) AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN pa ON pa.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#3' AND p.p_type = 'SMALL'
      AND l.l_quantity < pa.qty_thresh
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue from below-average-quantity orders of a
    brand — the correlated AVG subquery decorrelated into a per-part
    aggregate joined back to the fact (exactly how Catalyst would
    rewrite it). The brand/type dim filter is broadcast; the per-part
    threshold table shuffles once on partkey, the fact's natural key."""
    l = table(spark, sf_dir, "lineitem")
    pa = l.groupBy("l_partkey").agg(
        (0.2 * (dsum("l_quantity") / F.count("l_quantity"))).alias("qty_thresh")
    )
    p = table(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#3") & (F.col("p_type") == "SMALL")
    ).select("p_partkey")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(pa, "l_partkey")
        .filter(F.col("l_quantity") < F.col("qty_thresh"))
        .agg(F.round(dsum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


@query(
    "q21_sole_late_supplier",
    oracle="""
    WITH late AS (
        SELECT l.l_orderkey, l.l_suppkey
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE o.o_orderstatus = 'F'
          AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY),
    multi AS (
        SELECT DISTINCT a.l_orderkey, a.l_suppkey
        FROM late a
        WHERE EXISTS (SELECT 1 FROM lineitem b
                      WHERE b.l_orderkey = a.l_orderkey
                        AND b.l_suppkey <> a.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM late c
                          WHERE c.l_orderkey = a.l_orderkey
                            AND c.l_suppkey <> a.l_suppkey))
    SELECT s.s_name, COUNT(*) AS numwait
    FROM multi JOIN supplier s ON multi.l_suppkey = s.s_suppkey
    GROUP BY s.s_name
    ORDER BY numwait DESC, s_name ASC
    LIMIT 20
    """,
)
def q21_sole_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who were the ONLY late shipper in
    finished multi-supplier orders — a semi join (some other supplier in
    the order) composed with an anti join (no other LATE supplier),
    both with inequality conjuncts. The late set is computed once and
    persisted; it feeds the anti join against itself."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_orderdate"
    )
    l = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    late = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY"))
        .select("l_orderkey", "l_suppkey")
        .distinct()
        .persist()
    )
    late.count()
    other = l.select(
        F.col("l_orderkey").alias("o_k"), F.col("l_suppkey").alias("o_s")
    ).distinct()
    multi = late.join(
        other,
        (late.l_orderkey == other.o_k) & (late.l_suppkey != other.o_s),
        "left_semi",
    )
    other_late = late.select(
        F.col("l_orderkey").alias("o_k"), F.col("l_suppkey").alias("o_s")
    )
    sole = multi.join(
        other_late,
        (multi.l_orderkey == other_late.o_k) & (multi.l_suppkey != other_late.o_s),
        "left_anti",
    )
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        sole.join(F.broadcast(s), sole.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name").asc())
        .limit(20)
    )
