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


_ZM_LO = "TIMESTAMP '1996-01-01 00:00:00'"
_ZM_HI = "TIMESTAMP '1997-01-01 00:00:00'"

_ZM_CLS_SQL = f"""
               CASE WHEN max_ship < {_ZM_LO} OR min_ship >= {_ZM_HI}
                         OR max_price <= 20000.0 THEN 'skip'
                    WHEN min_ship >= {_ZM_LO} AND max_ship < {_ZM_HI}
                         AND min_price > 20000.0 THEN 'full'
                    ELSE 'scan' END"""


@query(
    "opt_zonemap_skipping_audit",
    oracle=f"""
    WITH chunks AS (
        SELECT 'natural' AS layout, l_orderkey // 256 AS chunk_id,
               l_shipdate, l_extendedprice
        FROM lineitem
        UNION ALL
        SELECT 'date_clustered' AS layout,
               CAST(year(l_shipdate) * 12 + month(l_shipdate) AS BIGINT) AS chunk_id,
               l_shipdate, l_extendedprice
        FROM lineitem),
    zm AS (
        SELECT layout, chunk_id,
               MIN(l_shipdate) AS min_ship, MAX(l_shipdate) AS max_ship,
               MIN(l_extendedprice) AS min_price, MAX(l_extendedprice) AS max_price,
               COUNT(*) AS n_rows
        FROM chunks GROUP BY 1, 2),
    cls AS (SELECT *, {_ZM_CLS_SQL} AS zone_class FROM zm)
    SELECT layout, zone_class,
           CAST(COUNT(*) AS BIGINT) AS n_chunks,
           CAST(SUM(n_rows) AS BIGINT) AS n_rows
    FROM cls GROUP BY layout, zone_class
    """,
)
def opt_zonemap_skipping_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone-map (file-statistics) skipping audit for the predicate
    `l_shipdate in [1996, 1997) AND l_extendedprice > 20000`, contrasted
    across two physical layouts of the SAME table.

    Chunks stand in for parquet files; per chunk the audit keeps only
    min/max envelopes — the footer stats a lakehouse format stores per
    file — and classifies each chunk `skip` (envelope disjoint from the
    predicate: file never opened), `full` (envelope contained: qualifies
    without evaluating the predicate), or `scan`. Layout `natural`
    (insertion order, chunk = orderkey div 256) leaves shipdate
    uncorrelated with chunk, so every envelope spans the whole year
    range and nothing skips; layout `date_clustered` (chunk = ship
    month, i.e. the reference's hidden day-partitioning at A19 coarsened
    to months) makes ~5/6 of chunks skip on the date bound alone. At
    100 TB this is THE pruning mechanism, and the audit is one scan +
    a #files-sized aggregate that prices exactly what a re-cluster
    (`zorder_cluster_keys`) buys for a given predicate."""
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate", "l_extendedprice")
    chunks = li.select(
        F.lit("natural").alias("layout"),
        F.expr("l_orderkey div 256").alias("chunk_id"),
        "l_shipdate",
        "l_extendedprice",
    ).unionAll(
        li.select(
            F.lit("date_clustered").alias("layout"),
            (F.year("l_shipdate") * 12 + F.month("l_shipdate")).cast("bigint").alias("chunk_id"),
            "l_shipdate",
            "l_extendedprice",
        )
    )
    zm = chunks.groupBy("layout", "chunk_id").agg(
        F.min("l_shipdate").alias("min_ship"),
        F.max("l_shipdate").alias("max_ship"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    lo = F.lit("1996-01-01 00:00:00").cast("timestamp")
    hi = F.lit("1997-01-01 00:00:00").cast("timestamp")
    cls = zm.withColumn(
        "zone_class",
        F.when(
            (F.col("max_ship") < lo) | (F.col("min_ship") >= hi) | (F.col("max_price") <= 20000.0),
            F.lit("skip"),
        )
        .when(
            (F.col("min_ship") >= lo) & (F.col("max_ship") < hi) & (F.col("min_price") > 20000.0),
            F.lit("full"),
        )
        .otherwise(F.lit("scan")),
    )
    return cls.groupBy("layout", "zone_class").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_chunks"),
        F.sum("n_rows").cast("bigint").alias("n_rows"),
    )


@query(
    "opt_join_cardinality_estimate",
    oracle="""
    WITH s AS (
        SELECT (SELECT COUNT(*) FROM orders)   AS n_o,
               (SELECT COUNT(DISTINCT o_custkey)  FROM orders)   AS d_o,
               (SELECT COUNT(*) FROM customer) AS n_c,
               (SELECT COUNT(DISTINCT c_custkey)  FROM customer) AS d_c,
               (SELECT COUNT(*) FROM lineitem) AS n_l,
               (SELECT COUNT(DISTINCT l_orderkey) FROM lineitem) AS d_lo,
               (SELECT COUNT(DISTINCT o_orderkey) FROM orders)   AS d_oo,
               (SELECT COUNT(DISTINCT l_partkey)  FROM lineitem) AS d_lp,
               (SELECT COUNT(*) FROM part)     AS n_p,
               (SELECT COUNT(DISTINCT p_partkey)  FROM part)     AS d_p),
    est AS (
        SELECT 'orders_x_customer' AS join_name,
               CAST(n_o AS DOUBLE) * n_c / GREATEST(d_o, d_c)  AS est_rows FROM s
        UNION ALL
        SELECT 'lineitem_x_orders',
               CAST(n_l AS DOUBLE) * n_o / GREATEST(d_lo, d_oo) FROM s
        UNION ALL
        SELECT 'lineitem_x_part',
               CAST(n_l AS DOUBLE) * n_p / GREATEST(d_lp, d_p)  FROM s),
    act AS (
        SELECT 'orders_x_customer' AS join_name, COUNT(*) AS actual_rows
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        UNION ALL
        SELECT 'lineitem_x_orders', COUNT(*)
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        UNION ALL
        SELECT 'lineitem_x_part', COUNT(*)
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey)
    SELECT e.join_name,
           ROUND(e.est_rows, 4) AS est_rows,
           CAST(a.actual_rows AS BIGINT) AS actual_rows,
           ROUND(GREATEST(e.est_rows / a.actual_rows,
                          a.actual_rows / e.est_rows), 4) AS q_error
    FROM est e JOIN act a ON e.join_name = a.join_name
    """,
)
def opt_join_cardinality_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cost-based-optimizer audit: the textbook equi-join cardinality
    estimate |A JOIN B| = |A|x|B| / max(ndv_a, ndv_b) against the TRUE
    join size, reported as q-error (max of over/under-estimate factor)
    for three TPC-H join shapes.

    This is the number a CBO bets shuffle sizes on at 100 TB — a
    q-error near 1 on the key joins is WHY Catalyst/AQE can order
    orders-before-part safely. Stats here are exact countDistinct for
    oracle determinism (a production engine uses HLL ndv — same
    estimator, sketched input); the three actual joins the audit
    ground-truths against are count-only (no payload columns survive
    the probe, so each is a narrow keys-only shuffle)."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    s = (
        o.agg(
            F.count(F.lit(1)).alias("n_o"),
            F.countDistinct("o_custkey").alias("d_o"),
            F.countDistinct("o_orderkey").alias("d_oo"),
        )
        .crossJoin(c.agg(F.count(F.lit(1)).alias("n_c"), F.countDistinct("c_custkey").alias("d_c")))
        .crossJoin(
            li.agg(
                F.count(F.lit(1)).alias("n_l"),
                F.countDistinct("l_orderkey").alias("d_lo"),
                F.countDistinct("l_partkey").alias("d_lp"),
            )
        )
        .crossJoin(p.agg(F.count(F.lit(1)).alias("n_p"), F.countDistinct("p_partkey").alias("d_p")))
    )
    est = (
        s.select(
            F.lit("orders_x_customer").alias("join_name"),
            (F.col("n_o").cast("double") * F.col("n_c") / F.greatest("d_o", "d_c")).alias("est_rows"),
        )
        .unionAll(
            s.select(
                F.lit("lineitem_x_orders"),
                F.col("n_l").cast("double") * F.col("n_o") / F.greatest("d_lo", "d_oo"),
            )
        )
        .unionAll(
            s.select(
                F.lit("lineitem_x_part"),
                F.col("n_l").cast("double") * F.col("n_p") / F.greatest("d_lp", "d_p"),
            )
        )
    )
    act = (
        o.join(c, o.o_custkey == c.c_custkey)
        .agg(F.count(F.lit(1)).alias("actual_rows"))
        .select(F.lit("orders_x_customer").alias("join_name"), "actual_rows")
        .unionAll(
            li.join(o, li.l_orderkey == o.o_orderkey)
            .agg(F.count(F.lit(1)).alias("actual_rows"))
            .select(F.lit("lineitem_x_orders"), "actual_rows")
        )
        .unionAll(
            li.join(p, li.l_partkey == p.p_partkey)
            .agg(F.count(F.lit(1)).alias("actual_rows"))
            .select(F.lit("lineitem_x_part"), "actual_rows")
        )
    )
    return est.join(act, "join_name").select(
        "join_name",
        F.round("est_rows", 4).alias("est_rows"),
        F.col("actual_rows").cast("bigint").alias("actual_rows"),
        F.round(
            F.greatest(
                F.col("est_rows") / F.col("actual_rows"),
                F.col("actual_rows") / F.col("est_rows"),
            ),
            4,
        ).alias("q_error"),
    )


@query(
    "opt_agg_pushdown_eager",
    oracle="""
    SELECT n.n_name,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS revenue
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def opt_agg_pushdown_eager(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eager aggregation (Yan & Larson 1995): the per-nation revenue
    rollup with the aggregate pushed BELOW the join — orders collapse to
    one row per custkey first, then join the (much smaller) partial
    aggregate up through customer to nation.

    Same answer as the oracle's join-then-aggregate plan, but the
    customer join probes |distinct custkeys| rows instead of |orders|,
    and the join shuffle carries two numeric columns instead of order
    payloads. At 100 TB the pre-agg runs map-side-combined on the fact
    scan, so the only wide data movement is the already-reduced
    (custkey, cnt, sum) stream — the rewrite CBOs apply when group keys
    functionally determine the join key. COUNT(*) re-derives as
    SUM(cnt) above the join; revenue stays a DECIMAL partial sum, so
    the two plans are bit-identical, not just approximately equal."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    pre = o.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(F.col("o_totalprice").cast("decimal(38,6)")).alias("rev"),
    )
    return (
        pre.join(c, pre.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.sum("cnt").cast("bigint").alias("n_orders"),
            F.sum("rev").cast("double").alias("revenue"),
        )
    )


# --- Hilbert vs Z-order clustering locality ----------------------------------

_HC_N = 16  # grid side; curve indices in [0, 255]
_HC_CHUNK = 24  # cells per chunk — deliberately NOT a power of 4:
# power-of-4-aligned chunks make both curves identical quadrant
# blocks; real file sizes are row-count bound, not curve-aligned


def _hilbert_step_exprs(s: int) -> dict[str, str]:
    """One xy2d iteration (Wikipedia's canonical loop) as dialect-
    agnostic SQL over columns (hx, hy, hd): rx/ry are the s-bit tests,
    d accumulates s^2 * ((3*rx) XOR ry) — the XOR written as the
    polynomial 3*rx + ry - 2*rx*ry so no dialect bit-op is needed —
    and the rotation flips/swaps the working point. Both engines parse
    the IDENTICAL text (Spark F.expr / DuckDB CTE), so the curve
    assignment cannot drift between the query and its oracle."""
    rx = f"(CASE WHEN (hx & {s}) > 0 THEN 1 ELSE 0 END)"
    ry = f"(CASE WHEN (hy & {s}) > 0 THEN 1 ELSE 0 END)"
    return {
        "hd": f"hd + {s * s} * (3 * {rx} + {ry} - 2 * {rx} * {ry})",
        "hx": (
            f"CASE WHEN {ry} = 0 THEN (CASE WHEN {rx} = 1 "
            f"THEN {_HC_N - 1} - hy ELSE hy END) ELSE hx END"
        ),
        "hy": (
            f"CASE WHEN {ry} = 0 THEN (CASE WHEN {rx} = 1 "
            f"THEN {_HC_N - 1} - hx ELSE hx END) ELSE hy END"
        ),
    }


_MORTON_EXPR = " + ".join(
    f"(CASE WHEN (x & {1 << b}) > 0 THEN {2 * (1 << b) * (1 << b)} ELSE 0 END)"
    f" + (CASE WHEN (y & {1 << b}) > 0 THEN {(1 << b) * (1 << b)} ELSE 0 END)"
    for b in range(4)
)


def _hilbert_cte_chain() -> str:
    """CTE layers h1..h4 running the four xy2d iterations in DuckDB."""
    out, prev = [], "(SELECT x, y, in_band, x AS hx, y AS hy, 0 AS hd FROM pts)"
    for i, s in enumerate((8, 4, 2, 1), start=1):
        e = _hilbert_step_exprs(s)
        out.append(
            f"h{i} AS (SELECT x, y, in_band, {e['hx']} AS hx, {e['hy']} AS hy, "
            f"{e['hd']} AS hd FROM {prev if i == 1 else f'h{i - 1}'})"
        )
    return ",\n    ".join(out)


@query(
    "opt_hilbert_vs_zorder_locality",
    oracle=f"""
    WITH b AS (
        SELECT MIN(CAST(o_orderdate AS DATE)) AS dmin,
               MAX(CAST(o_orderdate AS DATE)) AS dmax,
               MIN(o_totalprice) AS pmin, MAX(o_totalprice) AS pmax
        FROM orders),
    pts AS (
        SELECT CAST(FLOOR(date_diff('day', b.dmin, CAST(o.o_orderdate AS DATE))
                          * {_HC_N}.0
                          / (date_diff('day', b.dmin, b.dmax) + 1)) AS INT) AS x,
               LEAST({_HC_N - 1},
                     CAST(FLOOR((o.o_totalprice - b.pmin) * {_HC_N}.0
                                / (b.pmax - b.pmin)) AS INT)) AS y,
               CASE WHEN CAST(FLOOR(date_diff('day', b.dmin,
                                              CAST(o.o_orderdate AS DATE))
                                    * {_HC_N}.0
                                    / (date_diff('day', b.dmin, b.dmax) + 1))
                         AS INT) BETWEEN 4 AND 7
                    THEN 1 ELSE 0 END AS in_band
        FROM orders o, b),
    {{HILBERT_CHAIN}},
    tagged AS (
        SELECT 'zorder' AS layout,
               CAST(FLOOR(({_MORTON_EXPR}) / {_HC_CHUNK}.0) AS INT) AS chunk_id,
               x, y, in_band
        FROM pts
        UNION ALL
        SELECT 'hilbert' AS layout,
               CAST(FLOOR(hd / {_HC_CHUNK}.0) AS INT) AS chunk_id,
               x, y, in_band
        FROM h4),
    chunks AS (
        SELECT layout, chunk_id,
               (MAX(x) - MIN(x) + 1) * (MAX(y) - MIN(y) + 1) AS bbox_area,
               MAX(in_band) AS touches_band, SUM(in_band) AS band_rows
        FROM tagged GROUP BY 1, 2)
    SELECT layout,
           CAST(COUNT(*) AS BIGINT) AS n_chunks,
           ROUND(SUM(bbox_area) * 1.0 / COUNT(*), 4) AS avg_bbox_area,
           CAST(SUM(touches_band) AS BIGINT) AS chunks_touched_by_band,
           CAST(SUM(band_rows) AS BIGINT) AS band_rows
    FROM chunks GROUP BY layout ORDER BY layout
    """.replace("{HILBERT_CHAIN}", _hilbert_cte_chain()),
)
def opt_hilbert_vs_zorder_locality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Space-filling-curve layout audit: the SAME (order date x price)
    point set clustered into chunks by Morton (Z-order) index vs
    Hilbert index, scored on the two things a lakehouse cares about —
    average chunk bounding-box area (tighter boxes = zone maps prune
    more, cf. opt_zonemap_skipping_audit) and how many chunks a
    date-band range query touches. With the chunk size unaligned to
    the curve's quadrant structure (as real row-count-bound files
    are), Hilbert's no-jump property yields materially tighter boxes
    than Z-order's bit-interleave — on the full grid, 26.2 vs 43.6
    average cells at 24 cells/chunk (Moon et al. 2001, "Analysis of
    the clustering properties of the Hilbert space-filling curve").

    The four xy2d iterations and the Morton interleave are emitted
    ONCE as dialect-agnostic integer CASE arithmetic and parsed by
    both engines verbatim — the curve math cannot diverge from the
    oracle. Plan: one scan to the 1-row bounds aggregate (broadcast
    back), one map-side projection per layout to (chunk, x, y), then
    #cells-sized aggregates; nothing row-scale shuffles at any corpus
    size, which is what makes curve re-clustering audits affordable
    before committing a 100 TB table rewrite."""
    o = table(spark, sf_dir, "orders").select("o_orderdate", "o_totalprice")
    b = o.agg(
        F.min(F.col("o_orderdate").cast("date")).alias("dmin"),
        F.max(F.col("o_orderdate").cast("date")).alias("dmax"),
        F.min("o_totalprice").alias("pmin"),
        F.max("o_totalprice").alias("pmax"),
    )
    pts = o.crossJoin(F.broadcast(b)).select(
        F.floor(
            F.datediff(F.col("o_orderdate").cast("date"), F.col("dmin"))
            * float(_HC_N)
            / (F.datediff("dmax", "dmin") + 1)
        )
        .cast("int")
        .alias("x"),
        F.least(
            F.lit(_HC_N - 1),
            F.floor(
                (F.col("o_totalprice") - F.col("pmin"))
                * float(_HC_N)
                / (F.col("pmax") - F.col("pmin"))
            ).cast("int"),
        ).alias("y"),
    )
    pts = pts.withColumn(
        "in_band", F.when(F.col("x").between(4, 7), F.lit(1)).otherwise(F.lit(0))
    )
    h = pts.withColumns({"hx": F.col("x"), "hy": F.col("y"), "hd": F.lit(0)})
    for s in (8, 4, 2, 1):
        e = _hilbert_step_exprs(s)
        h = h.withColumns({k: F.expr(v) for k, v in e.items()})
    tagged = pts.select(
        F.lit("zorder").alias("layout"),
        F.floor(F.expr(_MORTON_EXPR) / float(_HC_CHUNK)).cast("int").alias("chunk_id"),
        "x",
        "y",
        "in_band",
    ).unionByName(
        h.select(
            F.lit("hilbert").alias("layout"),
            F.floor(F.col("hd") / float(_HC_CHUNK)).cast("int").alias("chunk_id"),
            "x",
            "y",
            "in_band",
        )
    )
    chunks = tagged.groupBy("layout", "chunk_id").agg(
        ((F.max("x") - F.min("x") + 1) * (F.max("y") - F.min("y") + 1)).alias("bbox_area"),
        F.max("in_band").alias("touches_band"),
        F.sum("in_band").alias("band_rows"),
    )
    return (
        chunks.groupBy("layout")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_chunks"),
            F.round(F.sum("bbox_area") * 1.0 / F.count(F.lit(1)), 4).alias(
                "avg_bbox_area"
            ),
            F.sum("touches_band").cast("bigint").alias("chunks_touched_by_band"),
            F.sum("band_rows").cast("bigint").alias("band_rows"),
        )
        .orderBy("layout")
    )
