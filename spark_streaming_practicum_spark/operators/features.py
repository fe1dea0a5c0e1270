"""Feature-store operators: leakage-free point-in-time enrichment and
multi-dimensional layout keys.

`pit_join_features` is THE training-data correctness primitive: a model
trained on purchase events may only see feature values computed from
STRICTLY EARLIER days (else label leakage). The scalable plan avoids a
per-probe range join entirely — feature versions and probe events are
UNIONed into one stream, sorted once per user, and a `last(...,
ignoreNulls)` running window carries the newest visible version forward
onto each probe row. One shuffle on user_id, sorted passes after; the
same trick as `ts_interpolate_linear` (operators/timeseries.py).

`zorder_cluster_keys` computes the interleaved-bit space-filling-curve
key behind Delta/Iceberg `OPTIMIZE ZORDER BY`: rows sorted by z-value
co-locate neighborhoods of BOTH dimensions, so min/max file statistics
prune scans on either predicate. The bit-interleave is one generated
integer expression — the identical text runs on Spark and DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import query


@query(
    "pit_join_features",
    oracle="""
    WITH versions AS (
        SELECT user_id,
               CAST(ts AS DATE) AS day,
               CAST(SUM(SUM(CAST(value AS DECIMAL(38,6))))
                        OVER (PARTITION BY user_id ORDER BY CAST(ts AS DATE))
                    AS DOUBLE) AS cum_spend
        FROM events
        GROUP BY user_id, CAST(ts AS DATE)
    ),
    probes AS (
        SELECT event_id, user_id, CAST(ts AS DATE) AS probe_day
        FROM events WHERE event_type = 'purchase'
    )
    SELECT p.event_id, p.user_id, p.probe_day, v.cum_spend AS feature_spend
    FROM probes p
    LEFT JOIN versions v
      ON v.user_id = p.user_id AND v.day < p.probe_day
    QUALIFY ROW_NUMBER() OVER (PARTITION BY p.event_id ORDER BY v.day DESC NULLS LAST) = 1
    """,
)
def pit_join_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time feature join: each purchase is enriched with the
    user's cumulative spend THROUGH THE PRIOR DAY (first-day purchases
    get NULL — no earlier snapshot exists). Implementation is the
    union-and-carry-forward plan (no range join): daily feature versions
    and probes interleave on (day, version-after-probe) so a version
    becomes visible only to strictly later probe days, and one
    `last(ignoreNulls)` window per user carries it forward. The oracle
    states the textbook range join + QUALIFY — same semantics, but the
    plan here shuffles each row once instead of exploding candidates."""
    e = table(spark, sf_dir, "events")
    day = F.col("ts").cast("date")

    versions = (
        e.groupBy("user_id", day.alias("day"))
        .agg(F.sum(F.col("value").cast("decimal(38,6)")).alias("day_spend"))
        .select(
            "user_id",
            "day",
            F.sum("day_spend")
            .over(Window.partitionBy("user_id").orderBy("day"))
            .cast("double")
            .alias("cum_spend"),
        )
        # kind=1: within a day, the version row sorts AFTER probe rows,
        # so same-day features are invisible to same-day probes.
        .select("user_id", "day", F.lit(1).alias("kind"), "cum_spend",
                F.lit(None).cast("long").alias("event_id"))
    )
    probes = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        day.alias("day"),
        F.lit(0).alias("kind"),
        F.lit(None).cast("double").alias("cum_spend"),
        "event_id",
    )
    merged = versions.unionByName(probes)
    w = (
        Window.partitionBy("user_id")
        .orderBy("day", "kind")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carried = merged.withColumn(
        "feature_spend", F.last("cum_spend", ignorenulls=True).over(w)
    )
    return carried.filter(F.col("kind") == 0).select(
        "event_id", "user_id", F.col("day").alias("probe_day"), "feature_spend"
    )


@query(
    "pareto_frontier_price_date",
    oracle="""
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
               MAX(o_totalprice)         AS day_max_price
        FROM orders
        GROUP BY CAST(o_orderdate AS DATE)
    )
    SELECT d.day, d.day_max_price
    FROM daily d
    WHERE NOT EXISTS (
        SELECT 1 FROM daily d2
        WHERE d2.day < d.day AND d2.day_max_price >= d.day_max_price)
    """,
)
def pareto_frontier_price_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto frontier (skyline) over (order day, max price): the days
    that set a new all-time price record. The oracle states the textbook
    quadratic NOT-EXISTS dominance check; the Spark plan is the
    O(n log n) single-pass equivalent — sort by day, running max over
    the strict past, keep rows that beat it. For 2-D skylines the
    running-extreme pass is the standard distributed rewrite (sort is
    a range partition, the window a sorted scan); the quadratic
    formulation would be a self-join explosion at 100 TB."""
    o = table(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").cast("date").alias("day")).agg(
        F.max("o_totalprice").alias("day_max_price")
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, -1)
    return (
        daily.withColumn("prev_max", F.max("day_max_price").over(w))
        .filter(F.col("prev_max").isNull() | (F.col("day_max_price") > F.col("prev_max")))
        .select("day", "day_max_price")
    )


def _zorder_expr(a: str, b: str, bits: int = 16) -> str:
    """Bit-interleave expression text, valid in both Spark SQL and DuckDB:
    z = .. b1 a1 b0 a0 (a gets even bit positions)."""
    terms = []
    for i in range(bits):
        terms.append(f"((({a} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({b} >> {i}) & 1) << {2 * i + 1})")
    return " | ".join(terms)


@query(
    "zorder_cluster_keys",
    oracle=f"""
    SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
           ({_zorder_expr("l_partkey", "l_suppkey")}) AS zval
    FROM lineitem
    ORDER BY zval, l_orderkey, l_linenumber
    LIMIT 100
    """,
)
def zorder_cluster_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering key over (l_partkey, l_suppkey): the
    space-filling-curve sort key behind `OPTIMIZE ZORDER BY`. Writing a
    table sorted by zval gives every file a tight min/max envelope on
    BOTH key columns, so scans filtering on either one prune files —
    the multi-dimensional generalization of the single-column
    partition pruning asserted in tests/test_sinks.py. The interleave
    is 32 codegen'd integer ops per row, no shuffle beyond the top-k."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.select(
            "l_orderkey",
            "l_linenumber",
            "l_partkey",
            "l_suppkey",
            F.expr(_zorder_expr("l_partkey", "l_suppkey")).alias("zval"),
        )
        .orderBy("zval", "l_orderkey", "l_linenumber")
        .limit(100)
    )
