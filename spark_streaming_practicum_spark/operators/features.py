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


@query(
    "target_encode_loo",
    oracle="""
    WITH g AS (
        SELECT event_type,
               SUM(CAST(value AS DECIMAL(38,6))) AS s,
               COUNT(*) AS n
        FROM events GROUP BY event_type)
    SELECT e.event_id, e.event_type,
           ROUND(CAST(g.s - CAST(e.value AS DECIMAL(38,6)) AS DOUBLE)
                 / (g.n - 1), 6) AS te_value
    FROM events e JOIN g USING (event_type)
    WHERE g.n > 1
    """,
)
def target_encode_loo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out target encoding: each row's category feature becomes
    the mean target of all OTHER rows in its category — the
    leakage-safe form of mean encoding (plain category means would leak
    each row's own label into its feature).

    One group aggregate reduces the corpus to |categories| (sum, count)
    rows that broadcast back onto the facts; the per-row encode
    (S - v) / (n - 1) is then map-side arithmetic. Sums accumulate in
    DECIMAL so the subtraction is exact and the result engine-portable;
    singleton categories are dropped in both engines (undefined LOO)."""
    e = table(spark, sf_dir, "events")
    dec = F.col("value").cast("decimal(38,6)")
    g = e.groupBy("event_type").agg(
        F.sum(dec).alias("s"), F.count(F.lit(1)).alias("n")
    )
    return (
        e.join(F.broadcast(g), "event_type")
        .filter(F.col("n") > 1)
        .select(
            "event_id",
            "event_type",
            F.round(
                (F.col("s") - dec).cast("double") / (F.col("n") - 1), 6
            ).alias("te_value"),
        )
    )


@query(
    "woe_iv_binning",
    oracle="""
    WITH feat AS (
        SELECT value, (event_type = 'purchase') AS is_pos FROM events),
    stats AS (SELECT MIN(value) AS mn, MAX(value) AS mx FROM feat),
    binned AS (
        SELECT LEAST(9, CAST(FLOOR((f.value - s.mn) * 10.0 / (s.mx - s.mn))
                             AS BIGINT)) AS bin,
               f.is_pos
        FROM feat f, stats s),
    per_bin AS (
        SELECT bin,
               SUM(CASE WHEN is_pos THEN 1 ELSE 0 END) AS n_pos,
               SUM(CASE WHEN is_pos THEN 0 ELSE 1 END) AS n_neg
        FROM binned GROUP BY bin),
    tot AS (SELECT SUM(n_pos) AS tp, SUM(n_neg) AS tn FROM per_bin)
    SELECT b.bin,
           CAST(b.n_pos AS BIGINT) AS n_pos,
           CAST(b.n_neg AS BIGINT) AS n_neg,
           ROUND(LN((b.n_pos * 1.0 / t.tp) / (b.n_neg * 1.0 / t.tn)), 6)
               AS woe,
           ROUND((b.n_pos * 1.0 / t.tp - b.n_neg * 1.0 / t.tn)
                 * LN((b.n_pos * 1.0 / t.tp) / (b.n_neg * 1.0 / t.tn)), 6)
               AS iv_contrib
    FROM per_bin b, tot t
    WHERE b.n_pos > 0 AND b.n_neg > 0
    ORDER BY b.bin
    """,
)
def woe_iv_binning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-of-Evidence / Information-Value binning — the classical
    credit-scoring feature audit: bin a numeric feature, compare each
    bin's share of positives vs negatives, WOE = ln of the share ratio,
    and the bin's IV contribution measures its predictive power.

    The whole computation reduces the corpus to 10 (bin, pos, neg)
    rows: one (min, max) aggregate to fix equi-width bin edges
    (broadcast back), one conditional-count aggregate, and a 1-row
    totals broadcast — three collapsing passes, no per-row state, the
    same shape at any corpus size. Zero-count bins are excluded in both
    engines (WOE undefined there; production systems smooth instead)."""
    e = table(spark, sf_dir, "events").select(
        "value", (F.col("event_type") == "purchase").alias("is_pos")
    )
    stats = e.agg(F.min("value").alias("mn"), F.max("value").alias("mx"))
    binned = e.crossJoin(F.broadcast(stats)).select(
        F.least(
            F.lit(9),
            F.floor(
                (F.col("value") - F.col("mn")) * 10.0 / (F.col("mx") - F.col("mn"))
            ).cast("long"),
        ).alias("bin"),
        "is_pos",
    )
    per_bin = binned.groupBy("bin").agg(
        F.sum(F.when(F.col("is_pos"), 1).otherwise(0)).alias("n_pos"),
        F.sum(F.when(F.col("is_pos"), 0).otherwise(1)).alias("n_neg"),
    )
    tot = per_bin.agg(F.sum("n_pos").alias("tp"), F.sum("n_neg").alias("tn"))
    pos_share = F.col("n_pos") * 1.0 / F.col("tp")
    neg_share = F.col("n_neg") * 1.0 / F.col("tn")
    woe = F.log(pos_share / neg_share)
    return (
        per_bin.crossJoin(F.broadcast(tot))
        .filter((F.col("n_pos") > 0) & (F.col("n_neg") > 0))
        .select(
            "bin",
            F.col("n_pos").cast("bigint").alias("n_pos"),
            F.col("n_neg").cast("bigint").alias("n_neg"),
            F.round(woe, 6).alias("woe"),
            F.round((pos_share - neg_share) * woe, 6).alias("iv_contrib"),
        )
        .orderBy("bin")
    )
