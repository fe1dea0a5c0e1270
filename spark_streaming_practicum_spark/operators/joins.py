"""Join operators (SURVEY.md §2C "Joins").

Scale notes baked into each plan:
- dimension tables (region/nation/supplier/part at TPC-H ratios) are
  broadcast — ``F.broadcast`` pins the hint so a 100 TB fact scan never
  shuffles for a dim join;
- fact-fact joins (orders x lineitem) shuffle on the join key, which is
  also the natural bucketing key for a real deployment;
- semi/anti joins use the dedicated join types (no distinct+inner hack),
  so Spark can stop probing on first match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..functions.aggs import dsum, dsum_sql
from ..registry import query


@query(
    "join_inner_equi",
    oracle="""
    SELECT c.c_mktsegment,
           COUNT(*)                    AS n,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS revenue
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_mktsegment
    """,
)
def join_inner_equi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner equi-join customer x orders, aggregated by segment."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "inner")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"), dsum("o_totalprice").alias("revenue"))
    )


@query(
    "join_left_outer",
    oracle="""
    SELECT c.c_custkey, c.c_name, COUNT(o.o_orderkey) AS n_orders,
           COALESCE(CAST(SUM(CAST(o.o_totalprice AS DECIMAL(38,6))) AS DOUBLE), 0.0) AS total
    FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey, c.c_name
    """,
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving customers without orders."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(dsum("o_totalprice"), F.lit(0.0)).alias("total"),
        )
    )


@query(
    "join_right_outer",
    oracle="""
    SELECT n.n_name, COUNT(s.s_suppkey) AS n_suppliers
    FROM supplier s RIGHT JOIN nation n ON s.s_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right outer join preserving nations without suppliers."""
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    return (
        s.join(n, s.s_nationkey == n.n_nationkey, "right")
        .groupBy("n_name")
        .agg(F.count("s_suppkey").alias("n_suppliers"))
    )


@query(
    "join_full_outer",
    oracle="""
    WITH cust_n AS (SELECT c_nationkey AS k, COUNT(*) AS n_cust FROM customer GROUP BY 1),
         supp_n AS (SELECT s_nationkey AS k, COUNT(*) AS n_supp FROM supplier GROUP BY 1)
    SELECT COALESCE(c.k, s.k)        AS nationkey,
           COALESCE(c.n_cust, 0)     AS n_cust,
           COALESCE(s.n_supp, 0)     AS n_supp
    FROM cust_n c FULL OUTER JOIN supp_n s ON c.k = s.k
    """,
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join of two pre-aggregates (agg-before-join keeps the
    shuffle narrow — the pattern that matters at 100 TB)."""
    c = (
        table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("k"))
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    s = (
        table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("k"))
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    return c.join(s, c.k == s.k, "full").select(
        F.coalesce(c.k, s.k).alias("nationkey"),
        F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
        F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
    )


@query(
    "join_semi",
    oracle="""
    SELECT o.o_orderkey, o.o_totalprice
    FROM orders o
    WHERE EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45)
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left semi join: orders having a high-quantity line item."""
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45)
    return o.join(li, o.o_orderkey == li.l_orderkey, "left_semi").select(
        "o_orderkey", "o_totalprice"
    )


@query(
    "join_anti",
    oracle="""
    SELECT c.c_custkey, c.c_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left anti join: customers with no orders."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@query(
    "join_cross",
    oracle="""
    SELECT r1.r_name AS r_a, r2.r_name AS r_b
    FROM region r1 CROSS JOIN region r2
    WHERE r1.r_regionkey < r2.r_regionkey
    """,
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross join (tiny dims only — unordered region pairs)."""
    r1 = table(spark, sf_dir, "region").select(
        F.col("r_regionkey").alias("k_a"), F.col("r_name").alias("r_a")
    )
    r2 = table(spark, sf_dir, "region").select(
        F.col("r_regionkey").alias("k_b"), F.col("r_name").alias("r_b")
    )
    return r1.crossJoin(r2).filter(F.col("k_a") < F.col("k_b")).select("r_a", "r_b")


@query(
    "join_range_events",
    oracle="""
    SELECT a.user_id, a.event_id AS eid_a, b.event_id AS eid_b,
           CAST(datediff('second', a.ts, b.ts) AS BIGINT) AS gap_s
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND b.ts > a.ts
     AND b.ts <= a.ts + INTERVAL 2 MINUTE
     AND a.event_type = 'click' AND b.event_type = 'purchase'
    """,
)
def join_range_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (theta) join: purchases within 2 minutes after a click by the
    same user. Equi component on user_id keeps the shuffle keyed; the
    range predicate is applied post-probe."""
    e = table(spark, sf_dir, "events")
    a = e.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("user_id"), F.col("event_id").alias("eid_a"), F.col("ts").alias("ts_a")
    )
    b = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("uid_b"), F.col("event_id").alias("eid_b"), F.col("ts").alias("ts_b")
    )
    joined = a.join(
        b,
        (a.user_id == b.uid_b)
        & (b.ts_b > a.ts_a)
        & (b.ts_b <= a.ts_a + F.expr("INTERVAL 2 MINUTES")),
        "inner",
    )
    return joined.select(
        "user_id",
        "eid_a",
        "eid_b",
        (F.unix_timestamp("ts_b") - F.unix_timestamp("ts_a")).alias("gap_s"),
    )


@query(
    "join_broadcast_star",
    oracle="""
    SELECT r.r_name, n.n_name,
           COUNT(*)                                                   AS n_items,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, n.n_name
    """,
)
def join_broadcast_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join: fact scan with three explicitly-broadcast dims — zero
    fact-side shuffles before the final narrow aggregation."""
    li = table(spark, sf_dir, "lineitem")
    s = F.broadcast(table(spark, sf_dir, "supplier"))
    n = F.broadcast(table(spark, sf_dir, "nation"))
    r = F.broadcast(table(spark, sf_dir, "region"))
    return (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(n, s.s_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
        )
    )


@query(
    "join_q3_shipping_priority",
    oracle="""
    SELECT l.l_orderkey,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue,
           o.o_orderdate
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l.l_shipdate  > TIMESTAMP '1996-03-15 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue DESC, l.l_orderkey ASC
    LIMIT 10
    """,
)
def join_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: filter-heavy 3-way join + agg + deterministic top-10.

    Customer (filtered) is broadcast; orders x lineitem shuffles on
    orderkey. The global top-10 is a TakeOrdered — no full sort at scale.
    """
    c = F.broadcast(
        table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    )
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1996-03-15 00:00:00").cast("timestamp")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
        .select("l_orderkey", "revenue", "o_orderdate")
    )


@query(
    "join_q5_local_supplier",
    oracle="""
    SELECT n.n_name,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
    GROUP BY n.n_name
    """,
)
def join_q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way join with a compound (two-column) join
    condition and region filter pushed into the broadcast dim."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    s = F.broadcast(table(spark, sf_dir, "supplier"))
    n = F.broadcast(table(spark, sf_dir, "nation"))
    r = F.broadcast(table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA"))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(s, (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(n, s.s_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
    )


@query(
    "join_null_skew_outer",
    oracle="""
    WITH c AS (SELECT c_custkey, c_name,
                      CASE WHEN c_acctbal < 0 THEN NULL ELSE c_nationkey END
                          AS nk
               FROM customer)
    SELECT c.c_custkey, c.c_name, n.n_name
    FROM c LEFT JOIN nation n ON c.nk = n.n_nationkey
    """,
)
def join_null_skew_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-key skew mitigation for outer joins: NULL join keys can never
    match, yet a plain left join shuffles every null-keyed row into ONE
    reducer (all NULLs hash identically) — with a 30%-null key at 100 TB
    that single partition is the job. The fix routes null-keyed rows
    AROUND the join (they get their NULL right side directly) and joins
    only the matchable split, then unions. The oracle is the PLAIN left
    join, proving the rewrite is semantically invisible.

    (Broadcast is disabled for the dim here only to force the shuffle
    path this pattern exists for; with a broadcastable dim Spark never
    shuffles the probe side and the mitigation is moot.)"""
    c = table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_name",
        F.when(F.col("c_acctbal") < 0, F.lit(None)).otherwise(F.col("c_nationkey")).alias("nk"),
    )
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_name").hint("shuffle_hash")
    matchable = c.filter(F.col("nk").isNotNull()).join(
        n, F.col("nk") == F.col("n_nationkey"), "left"
    )
    unmatchable = c.filter(F.col("nk").isNull()).withColumn("n_name", F.lit(None).cast("string"))
    return matchable.select("c_custkey", "c_name", "n_name").unionByName(
        unmatchable.select("c_custkey", "c_name", "n_name")
    )


@query(
    "join_runtime_bloom_filter",
    oracle="""
    SELECT l.l_orderkey, l.l_linenumber,
           CAST(l.l_quantity AS DOUBLE) AS qty,
           o.o_orderpriority
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderpriority = '1-URGENT' AND o.o_totalprice > 250000
    """,
)
def join_runtime_bloom_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle join shaped for Spark's RUNTIME BLOOM FILTER injection —
    the row-level runtime-filtering feature that matters most at 100 TB:
    when one join side carries a selective filter, the optimizer builds a
    bloom filter over its join keys and pushes a might_contain() probe
    into the OTHER side's scan, discarding non-joining fact rows before
    they reach the shuffle. Here the selective side (urgent, high-value
    orders) filters the lineitem scan; the merge hint forces the shuffle
    path the feature exists for (a broadcast join already implies its own
    filter). The injection itself is asserted in
    tests/test_physical_plans.py with the size thresholds lowered to
    harness scale; semantics are the plain join, which is what the
    oracle checks."""
    li = table(spark, sf_dir, "lineitem")
    o = (
        table(spark, sf_dir, "orders")
        .filter((F.col("o_orderpriority") == "1-URGENT") & (F.col("o_totalprice") > 250000))
        .hint("merge")
    )
    return li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_quantity").cast("double").alias("qty"),
        "o_orderpriority",
    )


@query(
    "join_shuffle_hash_hint",
    oracle="""
    SELECT n.n_name, COUNT(*) AS n_customers
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def join_shuffle_hash_hint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-strategy control: the SHUFFLE_HASH hint forces a
    ShuffledHashJoin where the planner would otherwise pick
    broadcast/sort-merge. On a real cluster this is the tool for the
    mid-size build side: too big to broadcast, but small enough per
    partition that hashing it beats sort-merge's double sort. Results
    are strategy-invariant (the oracle is the plain join); the plan
    shape is pinned in tests/test_round2_late_plans.py."""
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation").hint("SHUFFLE_HASH")
    return (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


@query(
    "interval_overlap_join_bucketized",
    oracle="""
    WITH sessions AS (
        SELECT user_id, CAST(ts AS DATE) AS day,
               MIN(ts) AS s_start, MAX(ts) AS s_end
        FROM events GROUP BY user_id, CAST(ts AS DATE)),
    peaks AS (
        SELECT CAST(ts AS DATE) AS day, ts AS peak_ts FROM (
            SELECT ts, value, event_id,
                   ROW_NUMBER() OVER (PARTITION BY CAST(ts AS DATE)
                                      ORDER BY value DESC, event_id ASC) AS rk
            FROM events)
        WHERE rk = 1),
    incidents AS (
        SELECT day AS incident_day,
               peak_ts - INTERVAL 30 MINUTE AS i_start,
               peak_ts + INTERVAL 30 MINUTE AS i_end
        FROM peaks)
    SELECT s.user_id, s.day, i.incident_day,
           CAST(date_diff('second', GREATEST(s.s_start, i.i_start),
                          LEAST(s.s_end, i.i_end)) AS BIGINT)
               AS overlap_seconds
    FROM sessions s JOIN incidents i
      ON s.s_start <= i.i_end AND i.i_start <= s.s_end
    ORDER BY s.user_id, s.day, i.incident_day
    """,
)
def interval_overlap_join_bucketized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join WITHOUT an equi key — per-user daily
    activity spans vs plant-wide incident windows (±30 min around each
    day's peak-value event): which users were active during an
    incident, and for how long. The naive plan is a nested-loop over
    |sessions| x |incidents|; the scalable shape BUCKETIZES time into
    1-hour grid cells, explodes each interval to the cells it covers
    (bounded: a daily span covers <= 25 cells, an incident <= 2), hash-
    joins on the cell, dedups pairs that share several cells, and only
    then evaluates the exact overlap predicate — the standard
    interval-join decomposition (same cell-grid trick as
    geo_grid_knn_join, applied to time).

    At 100 TB: the cell join is an equi shuffle whose fanout is
    interval-length/cell-width, incidents are typically broadcast-
    size, and no row pair outside a shared hour is ever materialized."""
    e = table(spark, sf_dir, "events")
    sessions = e.groupBy(
        "user_id", F.col("ts").cast("date").alias("day")
    ).agg(F.min("ts").alias("s_start"), F.max("ts").alias("s_end"))
    from pyspark.sql import Window as W

    rk = W.partitionBy(F.col("ts").cast("date")).orderBy(
        F.col("value").desc(), F.col("event_id").asc()
    )
    incidents = (
        e.withColumn("rk", F.row_number().over(rk))
        .filter(F.col("rk") == 1)
        .select(
            F.col("ts").cast("date").alias("incident_day"),
            (F.col("ts") - F.expr("INTERVAL 30 MINUTES")).alias("i_start"),
            (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("i_end"),
        )
    )

    pairs = _interval_overlap_pairs(sessions, incidents, small_incidents=True)
    overlap = (
        F.unix_timestamp(F.least("s_end", "i_end"))
        - F.unix_timestamp(F.greatest("s_start", "i_start"))
    ).cast("bigint")
    return pairs.select(
        "user_id", "day", "incident_day", overlap.alias("overlap_seconds")
    ).orderBy("user_id", "day", "incident_day")


def _interval_overlap_pairs(
    sessions: DataFrame, incidents: DataFrame, small_incidents: bool = False
) -> DataFrame:
    """The bucketized interval-overlap core: explode both interval sets
    to 1-hour grid cells, equi-join on the cell, dedup multi-cell
    pairs, then verify the exact predicate.

    ``small_incidents=True`` adds the broadcast hint (the registered
    query's incidents are one-per-day — always tiny). WITHOUT the hint
    the plan is a plain shuffled equi-join on the cell key, which is
    the shape that survives a non-broadcast-sized incident side at
    100 TB — pinned by the round-4 scale test
    (tests/test_round4_plans.py): hash join on `cell`, never a
    BroadcastNestedLoopJoin, results unchanged."""

    def cells(start, end):
        return F.sequence(
            F.floor(F.unix_timestamp(start) / 3600).cast("long"),
            F.floor(F.unix_timestamp(end) / 3600).cast("long"),
        )

    s_cells = sessions.select(
        "*", F.explode(cells(F.col("s_start"), F.col("s_end"))).alias("cell")
    )
    i_cells = incidents.select(
        "*", F.explode(cells(F.col("i_start"), F.col("i_end"))).alias("cell")
    )
    if small_incidents:
        i_cells = F.broadcast(i_cells)
    return (
        s_cells.join(i_cells, "cell")
        .select("user_id", "day", "incident_day", "s_start", "s_end", "i_start", "i_end")
        .distinct()
        .filter(
            (F.col("s_start") <= F.col("i_end")) & (F.col("i_start") <= F.col("s_end"))
        )
    )


@query(
    "join_yannakakis_semijoin_reduce",
    oracle="""
    SELECT n.n_name,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS revenue
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n.n_name
    """,
)
def join_yannakakis_semijoin_reduce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Yannakakis semijoin-reduction program for the acyclic chain
    region -> nation -> customer -> orders (same answer as the plain
    4-way join the oracle runs).

    Pass 1 (bottom-up reduction, all map-side): nation is reduced by the
    filtered region, customer by the reduced nation, and the date-filtered
    orders fact is LEFT-SEMI-reduced by the surviving customer keys — a
    broadcast semijoin that ships only a distinct-key set (~240 MB even
    at 100 TB scale; if a lower-selectivity reducer outgrew the broadcast
    ceiling, dropping the hint degrades to a keys-only shuffle, never a
    wide one), so the fact scan drops non-qualifying rows BEFORE any
    wide join materializes. Pass 2 (top-down join) then runs over the reduced fact,
    and Yannakakis guarantees no intermediate exceeds the final output.
    Versus joining first and filtering later, the shuffle carries ~1/5 of
    the orders (region selectivity) and none of the dropped rows' widths."""
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = table(spark, sf_dir, "nation").join(
        F.broadcast(r.select("r_regionkey")), F.col("n_regionkey") == F.col("r_regionkey"), "leftsemi"
    )
    c = table(spark, sf_dir, "customer").join(
        F.broadcast(n.select("n_nationkey")), F.col("c_nationkey") == F.col("n_nationkey"), "leftsemi"
    )
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    o_red = o.join(
        F.broadcast(c.select("c_custkey").distinct()), F.col("o_custkey") == F.col("c_custkey"), "leftsemi"
    )
    return (
        o_red.join(c.select("c_custkey", "c_nationkey"), o_red.o_custkey == F.col("c_custkey"))
        .join(F.broadcast(table(spark, sf_dir, "nation").select("n_nationkey", "n_name")),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("n_orders"), dsum("o_totalprice").alias("revenue"))
    )
