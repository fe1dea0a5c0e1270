"""Window-function operators (SURVEY.md §2C "Window functions").

Every window carries a total ordering (tie-break on a key column) so
``lag``/``row_number`` values are deterministic and hash-stable against
the DuckDB oracle.

Scale note: a window partitioned by a key shuffles once on that key and
sorts within partitions — same cost shape as a keyed agg. Avoid
partition-less windows (single-task global sort) except for tiny inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table
from ..functions.aggs import dsum, dsum_sql
from ..registry import query


@query(
    "window_topk_per_group",
    oracle="""
    SELECT * FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               ROW_NUMBER() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        FROM orders)
    WHERE rn <= 3
    """,
)
def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer via row_number (shuffle once on custkey;
    AQE-friendly; no global sort)."""
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        table(spark, sf_dir, "orders")
        .select("o_custkey", "o_orderkey", "o_totalprice", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 3)
    )


@query(
    "window_rank_dense",
    oracle="""
    SELECT p_partkey, p_brand, p_retailprice,
           RANK()       OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC) AS price_rank,
           DENSE_RANK() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC) AS price_dense_rank
    FROM part
    """,
)
def window_rank_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank / dense_rank within brand (rank values are deterministic even
    with price ties)."""
    w = Window.partitionBy("p_brand").orderBy(F.col("p_retailprice").desc())
    return table(spark, sf_dir, "part").select(
        "p_partkey",
        "p_brand",
        "p_retailprice",
        F.rank().over(w).alias("price_rank"),
        F.dense_rank().over(w).alias("price_dense_rank"),
    )


@query(
    "window_lag_lead",
    oracle="""
    SELECT user_id, event_id, event_type,
           LAG(event_type)  OVER w AS prev_type,
           LEAD(event_type) OVER w AS next_type,
           CAST(COALESCE(datediff('second', LAG(ts) OVER w, ts), -1) AS BIGINT) AS secs_since_prev
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
    """,
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead over each user's event timeline (event_id tie-break)."""
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    e = table(spark, sf_dir, "events")
    return e.select(
        "user_id",
        "event_id",
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
        F.lead("event_type").over(w).alias("next_type"),
        F.coalesce(
            F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w)), F.lit(-1)
        ).alias("secs_since_prev"),
    )


@query(
    "window_running_sum",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6)))
                OVER (PARTITION BY o_custkey
                      ORDER BY o_orderdate ASC, o_orderkey ASC
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
               AS running_total
    FROM orders
    """,
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total per customer (ROWS frame, deterministic order)."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.sum(F.col("o_totalprice").cast("decimal(38,6)")).over(w).cast("double").alias("running_total"),
    )


@query(
    "window_moving_avg",
    oracle="""
    SELECT user_id, event_id,
           CAST(SUM(CAST(value AS DECIMAL(38,6)))
                OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
           / COUNT(*) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                            ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS mov_avg3
    FROM events
    """,
)
def window_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-row moving average of event value per user."""
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(-2, Window.currentRow)
    )
    return table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        (
            F.sum(F.col("value").cast("decimal(38,6)")).over(w).cast("double")
            / F.count(F.lit(1)).over(w)
        ).alias("mov_avg3"),
    )


@query(
    "window_ntile",
    oracle="""
    SELECT c_custkey, c_acctbal,
           NTILE(4) OVER (ORDER BY c_acctbal ASC, c_custkey ASC) AS balance_quartile
    FROM customer
    """,
)
def window_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global quartile assignment (partition-less window — acceptable for
    dimension-sized inputs; at fact scale use approx percentiles instead)."""
    w = Window.orderBy(F.col("c_acctbal").asc(), F.col("c_custkey").asc())
    return table(spark, sf_dir, "customer").select(
        "c_custkey", "c_acctbal", F.ntile(4).over(w).alias("balance_quartile")
    )


@query(
    "window_sessionize",
    oracle="""
    WITH flagged AS (
        SELECT user_id, event_id, ts,
               CASE WHEN datediff('second',
                         LAG(ts) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC),
                         ts) > 1800
                    OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) IS NULL
                    THEN 1 ELSE 0 END AS is_new
        FROM events),
    numbered AS (
        SELECT user_id, event_id, ts,
               SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_no
        FROM flagged)
    SELECT user_id, CAST(session_no AS BIGINT) AS session_no, COUNT(*) AS n_events,
           MIN(ts) AS session_start, MAX(ts) AS session_end
    FROM numbered
    GROUP BY user_id, session_no
    """,
)
def window_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands sessionization (30-min inactivity gap): the batch
    analogue of streaming session windows, one shuffle on user_id."""
    order = [F.col("ts").asc(), F.col("event_id").asc()]
    w = Window.partitionBy("user_id").orderBy(*order)
    w_run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    e = table(spark, sf_dir, "events")
    prev_ts = F.lag("ts").over(w)
    is_new = F.when(
        prev_ts.isNull()
        | (F.unix_timestamp("ts") - F.unix_timestamp(prev_ts) > 30 * 60),
        F.lit(1),
    ).otherwise(F.lit(0))
    return (
        e.select("user_id", "event_id", "ts", is_new.alias("is_new"))
        .select("user_id", "event_id", "ts", F.sum("is_new").over(w_run).alias("session_no"))
        .groupBy("user_id", "session_no")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
    )


@query(
    "window_range_frame",
    oracle="""
    SELECT user_id, event_id,
           COUNT(*) OVER (PARTITION BY user_id
                          ORDER BY CAST(FLOOR(epoch(ts)) AS BIGINT)
                          RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) AS n_last_hour,
           CAST(SUM(CAST(value AS DECIMAL(38,6)))
                OVER (PARTITION BY user_id
                      ORDER BY CAST(FLOOR(epoch(ts)) AS BIGINT)
                      RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) AS DOUBLE) AS sum_last_hour
    FROM events
    """,
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame (value-based, not row-based): per-user rolling one-hour
    event count and value sum. Ordering on epoch SECONDS on both sides
    (Spark rangeBetween needs a numeric ordering column; DuckDB mirrors
    with FLOOR(epoch(ts)))."""
    e = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_timestamp("ts"))
        .rangeBetween(-3600, Window.currentRow)
    )
    return e.select(
        "user_id",
        "event_id",
        F.count(F.lit(1)).over(w).alias("n_last_hour"),
        F.sum(F.col("value").cast("decimal(38,6)")).over(w).cast("double").alias("sum_last_hour"),
    )


@query(
    "window_ratio_to_report",
    oracle="""
    SELECT o_custkey, o_orderkey,
           ROUND(CAST(CAST(o_totalprice AS DECIMAL(38,6))
                      / SUM(CAST(o_totalprice AS DECIMAL(38,6)))
                            OVER (PARTITION BY o_custkey) AS DOUBLE), 6)
               AS share_of_customer
    FROM orders
    """,
)
def window_ratio_to_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-to-report: each order's share of its customer's total spend
    — the percent-of-total window every BI layer ships (Oracle's
    RATIO_TO_REPORT), done with one unbounded SUM window per key.
    One shuffle on the partition key; the denominator accumulates in
    DECIMAL so shares are identical across engines and partitionings."""
    w = Window.partitionBy("o_custkey")
    dec = F.col("o_totalprice").cast("decimal(38,6)")
    return table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.round((dec / F.sum(dec).over(w)).cast("double"), 6).alias(
            "share_of_customer"
        ),
    )


@query(
    "session_window_builtin",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts, value,
               CASE WHEN datediff('second',
                         LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                         ts) > 1800
                    OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       IS NULL
                    THEN 1 ELSE 0 END AS is_new
        FROM events WHERE user_id % 23 = 0),
    numbered AS (
        SELECT user_id, ts, value,
               SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS session_no
        FROM flagged)
    SELECT user_id,
           MIN(ts) AS session_start,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_value
    FROM numbered
    GROUP BY user_id, session_no
    """,
)
def session_window_builtin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's BUILT-IN ``session_window`` (30-min gap) in batch mode,
    oracled against the hand-rolled gaps-and-islands SQL — proving the
    native session operator and the classical LAG/SUM reconstruction
    (window_sessionize) assign identical sessions. The built-in is the
    form that also runs under Structured Streaming with state cleanup;
    the plan is one shuffle on the session key's user component."""
    e = table(spark, sf_dir, "events").filter(F.col("user_id") % 23 == 0)
    return (
        e.groupBy(
            F.session_window("ts", "30 minutes").alias("w"), "user_id"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(38,6)"))
            .cast("double")
            .alias("sum_value"),
            F.min("ts").alias("session_start"),
        )
        .select("user_id", "session_start", "n_events", "sum_value")
    )


@query(
    "window_running_distinct_types",
    oracle="""
    SELECT event_id, user_id, event_type,
           CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END)
                OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_types_so_far
    FROM (SELECT *,
                 ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                    ORDER BY ts ASC, event_id ASC) AS rn
          FROM events)
    """,
)
def window_running_distinct_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running DISTINCT count over each user's event timeline — how many
    distinct event types the user has touched as of each event — via the
    first-occurrence trick: flag the first (user, type) row, then a
    cumulative SUM of flags.

    Spark has no `COUNT(DISTINCT) OVER`, and the naive
    `size(collect_set() OVER)` materializes a growing set per row
    (O(timeline²) memory on a power user). The two-window rewrite is
    exact, carries one int per row, and both windows hash-partition on
    the high-cardinality user_id — no global sort, no skewed state.

    One shuffle, not two: the explicit repartition on user_id satisfies
    BOTH windows' clustering (hash(user_id) co-locates (user_id,
    event_type) groups too — a coarser partitioning satisfies the finer
    ClusteredDistribution), so Catalyst inserts no second Exchange for
    the (user, type) window, only a re-sort (plan-pinned in
    tests/test_round5_plans.py)."""
    w_first = Window.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    w_run = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ev = (
        table(spark, sf_dir, "events")
        .select("event_id", "user_id", "event_type", "ts")
        .repartition("user_id")
    )
    return (
        ev.withColumn("is_first", (F.row_number().over(w_first) == 1).cast("int"))
        .withColumn("n_types_so_far", F.sum("is_first").over(w_run).cast("bigint"))
        .select("event_id", "user_id", "event_type", "n_types_so_far")
    )


_HYST_HI, _HYST_LO = 80.0, 30.0  # alert above hi, clear below lo


@query(
    "window_alert_hysteresis",
    oracle=f"""
    WITH sig AS (
        SELECT user_id, event_id, ts, value,
               CASE WHEN value > {_HYST_HI} THEN 1
                    WHEN value < {_HYST_LO} THEN 0 END AS edge
        FROM events),
    st AS (
        SELECT user_id, event_id, value,
               COALESCE(LAST_VALUE(edge IGNORE NULLS)
                   OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                         ROWS UNBOUNDED PRECEDING), 0) AS alert_state
        FROM sig)
    SELECT user_id, event_id, value, CAST(alert_state AS INT) AS alert_state
    FROM st
    """,
)
def window_alert_hysteresis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-threshold hysteresis alerting (alert latches on value > 80,
    clears only below 30 — the debounce pattern every monitoring system
    uses so values oscillating inside the band don't flap).

    Looks like a sequential state machine, but the latch state is just
    the LAST CROSSING SEEN: rows inside the band emit NULL, crossings
    emit 0/1, and `last_value(..., ignoreNulls)` over the ordered
    user timeline replays the machine exactly — one user-keyed window,
    no UDF, no iteration, and the identical plan runs as a streaming
    aggregation over a watermark. The edge CASE has no ELSE, so the
    band's NULLs are what the window skips."""
    e = table(spark, sf_dir, "events")
    edge = F.when(F.col("value") > _HYST_HI, F.lit(1)).when(
        F.col("value") < _HYST_LO, F.lit(0)
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return e.select(
        "user_id",
        "event_id",
        "value",
        F.coalesce(
            F.last(edge, ignorenulls=True).over(w), F.lit(0)
        ).cast("int").alias("alert_state"),
    )


# --- exact sliding median ----------------------------------------------------------


@query(
    "window_sliding_median_daily",
    oracle=f"""
    WITH daily AS (
        SELECT date_trunc('day', ts) AS day,
               {dsum_sql('value')} / COUNT(*) AS m
        FROM events GROUP BY day)
    SELECT CAST(day AS DATE) AS day, ROUND(m, 6) AS daily_mean,
           ROUND(quantile_cont(m, 0.5) OVER (
                     ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW),
                 6) AS median7
    FROM daily ORDER BY day
    """,
)
def window_sliding_median_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT 7-day sliding median of the daily mean event value — the
    robust smoother a monitor wants where a sliding mean would chase
    outliers. Spark has no exact median window aggregate, so the frame
    is materialized as a bounded collect_list window (7 elements by
    construction) and the median is computed by HOF array_sort +
    element arithmetic — interpolating between the two mid elements on
    even counts, exactly DuckDB's quantile_cont(0.5) semantics.

    Exactness: daily means are DECIMAL-sum/count doubles, identical in
    both engines; sorting 7 identical doubles and averaging two of
    them is deterministic. Plan: the corpus collapses to day rows
    first, so the per-row list frame is 7 elements over a
    calendar-bounded series — O(1) memory per row at any corpus scale
    (the pattern to AVOID is this same window over raw events)."""
    daily = (
        table(spark, sf_dir, "events")
        .groupBy(F.date_trunc("day", F.col("ts")).alias("day"))
        .agg((dsum("value") / F.count(F.lit(1))).alias("m"))
    )
    w = Window.orderBy("day").rowsBetween(-6, 0)
    arr = F.array_sort(F.collect_list("m").over(w))
    k = F.size(arr)
    lo = F.element_at(arr, ((k + 1) / 2).cast("int"))
    hi = F.element_at(arr, (k / 2 + 1).cast("int"))
    return daily.select(
        F.col("day").cast("date").alias("day"),
        F.round("m", 6).alias("daily_mean"),
        F.round((lo + hi) / 2.0, 6).alias("median7"),
    ).orderBy("day")


# --- Bollinger bands -----------------------------------------------------------------


@query(
    "window_bollinger_bands_daily",
    oracle=f"""
    WITH daily AS (
        SELECT date_trunc('day', ts) AS day,
               {dsum_sql('value')} / COUNT(*) AS m
        FROM events GROUP BY day),
    win AS (
        SELECT day, m,
               COUNT(*) OVER w AS k,
               CAST(SUM(CAST(m AS DECIMAL(38,12))) OVER w AS DOUBLE) AS s,
               CAST(SUM(CAST(m * m AS DECIMAL(38,12))) OVER w AS DOUBLE) AS ss
        FROM daily
        WINDOW w AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)),
    bands AS (
        -- variances below 1e-9 are pure float-cancellation noise (a
        -- 1-element window's true variance is 0); clamp BEFORE sqrt,
        -- which would amplify sub-ulp noise into the rounded digits
        SELECT day, m, k, s / k AS mid,
               SQRT(CASE WHEN ss / k - (s / k) * (s / k) < 1e-9 THEN 0.0
                         ELSE ss / k - (s / k) * (s / k) END) AS sd
        FROM win)
    SELECT CAST(day AS DATE) AS day, ROUND(m, 6) AS daily_mean,
           ROUND(mid, 6) AS band_mid,
           ROUND(mid - 2 * sd, 6) AS band_lo,
           ROUND(mid + 2 * sd, 6) AS band_hi,
           m > mid + 2 * sd OR m < mid - 2 * sd AS is_outside
    FROM bands ORDER BY day
    """,
)
def window_bollinger_bands_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bollinger bands (7-day window, +-2 sigma population std) over
    the daily mean event value, with the outside-band flag — the
    volatility-adaptive envelope that complements the fixed-threshold
    hysteresis latch (window_alert_hysteresis) and the robust sliding
    median (window_sliding_median_daily): the band WIDENS in volatile
    regimes, so alerts fire on regime-relative moves.

    Exactness: windowed count/sum/sum-of-squares ride DECIMAL
    accumulation over the DECIMAL-mean daily series, so mid/sd divide
    identical exact sums; variances below 1e-9 clamp to exact 0 before
    the sqrt (float cancellation noise — a 1-element window's true
    variance is 0 — would otherwise be amplified into rounded digits;
    same clamp both sides). Plan: one corpus aggregate to day rows;
    the window is a 7-row frame over the calendar-bounded series."""
    daily = (
        table(spark, sf_dir, "events")
        .groupBy(F.date_trunc("day", F.col("ts")).alias("day"))
        .agg((dsum("value") / F.count(F.lit(1))).alias("m"))
    )
    w = Window.orderBy("day").rowsBetween(-6, 0)
    win = daily.select(
        "day",
        "m",
        F.count(F.lit(1)).over(w).alias("k"),
        F.sum(F.col("m").cast("decimal(38,12)")).over(w).cast("double").alias("s"),
        F.sum((F.col("m") * F.col("m")).cast("decimal(38,12)"))
        .over(w)
        .cast("double")
        .alias("ss"),
    )
    mid = F.col("s") / F.col("k")
    # clamp sub-1e-9 variances to exact 0 (mirrored in the oracle):
    # sqrt amplifies cancellation noise into the rounded digits
    var = F.col("ss") / F.col("k") - mid * mid
    sd = F.sqrt(F.when(var < 1e-9, F.lit(0.0)).otherwise(var))
    return win.select(
        F.col("day").cast("date").alias("day"),
        F.round("m", 6).alias("daily_mean"),
        F.round(mid, 6).alias("band_mid"),
        F.round(mid - 2 * sd, 6).alias("band_lo"),
        F.round(mid + 2 * sd, 6).alias("band_hi"),
        ((F.col("m") > mid + 2 * sd) | (F.col("m") < mid - 2 * sd)).alias("is_outside"),
    ).orderBy("day")
