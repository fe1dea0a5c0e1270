"""Second scalar/aggregate function pack: statistical aggregates,
boolean aggregates, bit manipulation, collection set-ops, nth_value —
rounding out the function surface a DuckDB-shell user would expect
(SURVEY.md §2B/§2C extensions)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import query


@query(
    "agg_statistics",
    oracle="""
    SELECT l_returnflag,
           ROUND(stddev_pop(l_quantity), 6)               AS sd_pop_qty,
           ROUND(stddev_samp(l_quantity), 6)              AS sd_samp_qty,
           ROUND(var_pop(l_quantity), 6)                  AS var_pop_qty,
           ROUND(corr(l_quantity, l_extendedprice), 6)    AS corr_qty_price,
           ROUND(covar_pop(l_quantity, l_discount), 6)    AS covar_qty_disc
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_statistics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates (stddev/variance/corr/covar). Values are
    irrational, so rounding at 6 is engine-stable."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_pop("l_quantity"), 6).alias("sd_pop_qty"),
        F.round(F.stddev_samp("l_quantity"), 6).alias("sd_samp_qty"),
        F.round(F.var_pop("l_quantity"), 6).alias("var_pop_qty"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
        F.round(F.covar_pop("l_quantity", "l_discount"), 6).alias("covar_qty_disc"),
    )


@query(
    "agg_bool",
    oracle="""
    SELECT o_orderpriority,
           bool_and(o_totalprice > 1000)    AS all_over_1k,
           bool_or(o_totalprice > 400000)   AS any_over_400k,
           COUNT(*)                         AS n
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def agg_bool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean aggregates (every/any)."""
    o = table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.bool_and(F.col("o_totalprice") > 1000).alias("all_over_1k"),
        F.bool_or(F.col("o_totalprice") > 400000).alias("any_over_400k"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "agg_collect_set_sorted",
    oracle="""
    SELECT o_custkey,
           array_to_string(list_sort(list(DISTINCT o_orderstatus)), ',') AS statuses,
           COUNT(*) AS n
    FROM orders
    GROUP BY o_custkey
    HAVING COUNT(*) >= 4
    """,
)
def agg_collect_set_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_set made deterministic with array_sort (joined to a string
    so the output is value-hashable by the comparison harness)."""
    o = table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(
            F.array_join(F.array_sort(F.collect_set("o_orderstatus")), ",").alias(
                "statuses"
            ),
            F.count(F.lit(1)).alias("n"),
        )
        .filter(F.col("n") >= 4)
    )


@query(
    "scalar_bit_ops",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_partkey & 255                       AS low_byte,
           l_partkey | 4096                      AS with_flag,
           xor(l_partkey, l_suppkey)             AS xored,
           l_partkey << 2                        AS shifted_l,
           l_partkey >> 3                        AS shifted_r
    FROM lineitem
    """,
)
def scalar_bit_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise and/or/xor/shifts (hash bucketing primitives)."""
    li = table(spark, sf_dir, "lineitem")
    pk = F.col("l_partkey")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        pk.bitwiseAND(F.lit(255)).alias("low_byte"),
        pk.bitwiseOR(F.lit(4096)).alias("with_flag"),
        pk.bitwiseXOR(F.col("l_suppkey")).alias("xored"),
        F.shiftleft(pk, 2).alias("shifted_l"),
        F.shiftright(pk, 3).alias("shifted_r"),
    )


@query(
    "scalar_array_setops",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           array_to_string(list_sort(list_distinct(list_intersect(
               [l_partkey % 5, l_suppkey % 5, l_linenumber % 5],
               [l_suppkey % 5, CAST(l_linenumber AS BIGINT)]))), ',') AS inter,
           array_to_string(list_sort(list_distinct(
               [l_partkey % 5, l_suppkey % 5, l_linenumber % 5] ||
               [l_suppkey % 5, CAST(l_linenumber AS BIGINT)])), ',')  AS uni,
           len(list_intersect([l_partkey % 5, l_suppkey % 5],
                              [l_suppkey % 5])) > 0                   AS overlaps
    FROM lineitem
    """,
)
def scalar_array_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array set operations (intersect/union/overlap), sorted+deduped so
    both engines' internal orderings cancel out; arrays are emitted as
    joined strings so the output is value-hashable."""
    li = table(spark, sf_dir, "lineitem")
    a = F.array(
        (F.col("l_partkey") % 5),
        (F.col("l_suppkey") % 5),
        (F.col("l_linenumber") % 5).cast("long"),
    )
    b = F.array((F.col("l_suppkey") % 5), F.col("l_linenumber").cast("long"))
    a2 = F.array((F.col("l_partkey") % 5), (F.col("l_suppkey") % 5))
    b2 = F.array((F.col("l_suppkey") % 5))

    def joined(col: F.Column) -> F.Column:
        return F.array_join(col.cast("array<string>"), ",")

    return li.select(
        "l_orderkey",
        "l_linenumber",
        joined(F.array_sort(F.array_distinct(F.array_intersect(a, b)))).alias("inter"),
        joined(F.array_sort(F.array_distinct(F.array_union(a, b)))).alias("uni"),
        F.arrays_overlap(a2, b2).alias("overlaps"),
    )


@query(
    "window_nth_value",
    oracle="""
    SELECT DISTINCT o_custkey,
           nth_value(o_orderkey, 2) OVER w AS second_orderkey,
           first_value(o_orderdate) OVER w AS first_date
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def window_nth_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nth_value over the full partition frame (second order per customer)."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_custkey",
        F.nth_value("o_orderkey", 2).over(w).alias("second_orderkey"),
        F.first("o_orderdate").over(w).alias("first_date"),
    ).distinct()


@query(
    "scalar_greatest_least",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           GREATEST(l_quantity, l_discount * 100, l_tax * 100) AS g,
           LEAST(l_quantity, l_extendedprice / 1000.0)         AS l
    FROM lineitem
    """,
)
def scalar_greatest_least(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GREATEST/LEAST across heterogeneous expressions (same IEEE inputs
    on both engines — exact)."""
    li = table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.greatest(
            F.col("l_quantity"), F.col("l_discount") * 100, F.col("l_tax") * 100
        ).alias("g"),
        F.least(F.col("l_quantity"), F.col("l_extendedprice") / 1000.0).alias("l"),
    )


@query(
    "scalar_pad_trim",
    oracle="""
    SELECT c_custkey,
           lpad(CAST(c_custkey AS VARCHAR), 8, '0')   AS padded_key,
           rpad(c_mktsegment, 12, '.')                AS padded_seg,
           trim('  ' || c_mktsegment || '  ')         AS trimmed,
           ltrim('xxID-' || CAST(c_custkey AS VARCHAR), 'x') AS ltrimmed
    FROM customer
    """,
)
def scalar_pad_trim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lpad/rpad/trim/ltrim (fixed-width key formatting)."""
    c = table(spark, sf_dir, "customer")
    key_str = F.col("c_custkey").cast("string")
    return c.select(
        "c_custkey",
        F.lpad(key_str, 8, "0").alias("padded_key"),
        F.rpad("c_mktsegment", 12, ".").alias("padded_seg"),
        F.trim(F.concat(F.lit("  "), F.col("c_mktsegment"), F.lit("  "))).alias("trimmed"),
        F.expr("ltrim('x', concat('xxID-', cast(c_custkey as string)))").alias("ltrimmed"),
    )


@query(
    "set_except_all",
    oracle="""
    SELECT l_suppkey AS k FROM lineitem WHERE l_returnflag = 'N'
    EXCEPT ALL
    SELECT l_suppkey AS k FROM lineitem WHERE l_returnflag = 'A'
    """,
)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL (bag difference, multiplicity-aware)."""
    li = table(spark, sf_dir, "lineitem")
    n = li.filter(F.col("l_returnflag") == "N").select(F.col("l_suppkey").alias("k"))
    a = li.filter(F.col("l_returnflag") == "A").select(F.col("l_suppkey").alias("k"))
    return n.exceptAll(a)


@query(
    "set_union_by_name",
    oracle="""
    SELECT custkey, name, segment, COUNT(*) AS n FROM (
        SELECT c_custkey AS custkey, c_name AS name, c_mktsegment AS segment FROM customer
        UNION ALL BY NAME
        SELECT o_custkey AS custkey, NULL AS name, NULL AS segment FROM orders
    ) GROUP BY custkey, name, segment
    """,
)
def set_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unionByName with missing columns (schema-aligned bag union — the
    schema-drift-tolerant append)."""
    c = table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey"),
        F.col("c_name").alias("name"),
        F.col("c_mktsegment").alias("segment"),
    )
    o = table(spark, sf_dir, "orders").select(F.col("o_custkey").alias("custkey"))
    u = c.unionByName(o, allowMissingColumns=True)
    return u.groupBy("custkey", "name", "segment").agg(F.count(F.lit(1)).alias("n"))


@query(
    "scalar_try_cast",
    oracle="""
    WITH m AS (
        SELECT event_id,
               CASE event_id % 4
                   WHEN 0 THEN CAST(event_id AS VARCHAR)
                   WHEN 1 THEN CAST(event_id AS VARCHAR) || 'x'
                   WHEN 2 THEN '99999999999999999999'
                   ELSE '' END AS s_int,
               CASE event_id % 3
                   WHEN 0 THEN '3.5'
                   WHEN 1 THEN 'nope'
                   ELSE CAST(event_id AS VARCHAR) END AS s_dbl,
               CASE event_id % 3
                   WHEN 0 THEN '2024-01-02'
                   WHEN 1 THEN '2024-13-01'
                   ELSE 'n/a' END AS s_date
        FROM events)
    SELECT event_id,
           TRY_CAST(s_int AS INTEGER) AS as_int,
           TRY_CAST(s_dbl AS DOUBLE)  AS as_double,
           TRY_CAST(s_date AS DATE)   AS as_date
    FROM m
    """,
)
def scalar_try_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-tolerant casting (try_cast): malformed, overflowing and
    empty inputs become NULL instead of failing the job — the ANSI-safe
    ingestion idiom for dirty columns. Messy strings are synthesized
    deterministically from event_id so the oracle sees identical inputs;
    only cases where Spark and DuckDB casting rules agree are used
    (decimal-string -> INT differs: Spark truncates, DuckDB rounds)."""
    e = table(spark, sf_dir, "events")
    eid = F.col("event_id")
    s_int = (
        F.when(eid % 4 == 0, eid.cast("string"))
        .when(eid % 4 == 1, F.concat(eid.cast("string"), F.lit("x")))
        .when(eid % 4 == 2, F.lit("99999999999999999999"))
        .otherwise(F.lit(""))
    )
    s_dbl = (
        F.when(eid % 3 == 0, F.lit("3.5"))
        .when(eid % 3 == 1, F.lit("nope"))
        .otherwise(eid.cast("string"))
    )
    s_date = (
        F.when(eid % 3 == 0, F.lit("2024-01-02"))
        .when(eid % 3 == 1, F.lit("2024-13-01"))
        .otherwise(F.lit("n/a"))
    )
    return e.select(
        "event_id",
        s_int.try_cast("int").alias("as_int"),
        s_dbl.try_cast("double").alias("as_double"),
        s_date.try_cast("date").alias("as_date"),
    )


@query(
    "scalar_posexplode_ordinality",
    oracle="""
    WITH words AS (SELECT doc_id, string_split(text, ' ') AS w
                   FROM documents WHERE doc_id % 50 = 0)
    SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos, w[i] AS word
    FROM words, unnest(generate_series(1, len(w))) AS t(i)
    """,
)
def scalar_posexplode_ordinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordinal table generation: ``posexplode`` emits (position, element)
    pairs — the WITH ORDINALITY surface. Position-aware expansion is
    what chunking/packing build on; the generator runs inside
    whole-stage codegen, no Python. Docs subsampled to bound the
    oracle compare."""
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") % 50 == 0)
    return d.select(
        "doc_id",
        F.posexplode(F.split(F.col("text"), r"\s+")),
    ).select("doc_id", F.col("pos").cast("long").alias("pos"), F.col("col").alias("word"))


@query(
    "agg_regression_price_qty",
    oracle="""
    SELECT l_returnflag,
           ROUND(regr_slope(l_extendedprice, l_quantity), 6)     AS slope,
           ROUND(regr_intercept(l_extendedprice, l_quantity), 6) AS intercept,
           ROUND(regr_r2(l_extendedprice, l_quantity), 6)        AS r2,
           regr_count(l_extendedprice, l_quantity)               AS n
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_regression_price_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-regression aggregates (regr_slope/intercept/r2/count,
    Spark 3.4+): price-vs-quantity fit per return flag, computed as
    one-pass moment sums inside the hash aggregate — the same
    partial/final merge as any sum, so it distributes like COUNT.
    Rounded at 6 (irrational ratios) like the other statistical aggs."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.regr_slope("l_extendedprice", "l_quantity"), 6).alias("slope"),
        F.round(F.regr_intercept("l_extendedprice", "l_quantity"), 6).alias("intercept"),
        F.round(F.regr_r2("l_extendedprice", "l_quantity"), 6).alias("r2"),
        F.regr_count("l_extendedprice", "l_quantity").alias("n"),
    )
