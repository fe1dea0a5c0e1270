"""Recommender-system operators over the event stream.

Two classical collaborative-filtering building blocks, done
relationally so they run at interaction-log scale:

- ``recsys_item_item_cosine`` — item-item similarity from user
  co-occurrence (the "people who viewed X also bought Y" core);
- ``als_user_factors_one_step`` — one exact ALS half-step: with item
  factors fixed, each user's k=2 latent factors solve a closed-form
  2x2 normal equation — the per-user independent solve that makes ALS
  embarrassingly parallel (Hu/Koren/Volinsky's implicit-feedback ALS,
  public method).

The reference has no recommendation surface; these are north-star
extension operators exercising per-key closed-form linear algebra.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import query

# Fixed k=2 item-factor initialization per event type (alphabetical).
_ALS_ITEMS = {
    "click": (1.0, 0.2),
    "error": (0.4, -0.3),
    "purchase": (1.2, 0.5),
    "signup": (0.8, -0.1),
    "view": (0.6, 0.4),
}
_ALS_LAMBDA = 0.1
_ALS_USER_MOD = 199  # report users with user_id % mod == 0 (bounded output)


@query(
    "recsys_item_item_cosine",
    oracle="""
    WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
    n AS (SELECT event_type, CAST(COUNT(*) AS DOUBLE) AS n
          FROM ut GROUP BY event_type),
    co AS (
        SELECT a.event_type AS item_a, b.event_type AS item_b,
               CAST(COUNT(*) AS DOUBLE) AS co
        FROM ut a JOIN ut b ON b.user_id = a.user_id
                           AND a.event_type < b.event_type
        GROUP BY 1, 2)
    SELECT co.item_a, co.item_b,
           CAST(co.co AS BIGINT) AS n_co_users,
           ROUND(co.co / (SQRT(na.n) * SQRT(nb.n)), 6) AS cosine
    FROM co
    JOIN n na ON na.event_type = co.item_a
    JOIN n nb ON nb.event_type = co.item_b
    ORDER BY item_a, item_b
    """,
)
def recsys_item_item_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item cosine similarity on the binary user-item incidence
    matrix: co-occurring-user count normalized by each item's user
    count — the precomputation behind 'users who did A also did B'.

    The raw log first collapses to DISTINCT (user, item); the pair join
    is user-keyed with per-user fanout bounded by the item alphabet —
    never |log|² — and per-item totals join back on the 5-row item key.
    Every score is count arithmetic: bit-stable."""
    ut = table(spark, sf_dir, "events").select("user_id", "event_type").distinct()
    n = ut.groupBy("event_type").agg(F.count(F.lit(1)).cast("double").alias("n"))
    a = ut.select("user_id", F.col("event_type").alias("item_a"))
    b = ut.select("user_id", F.col("event_type").alias("item_b"))
    co = (
        a.join(b, "user_id")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).cast("double").alias("co"))
    )
    na = n.select(F.col("event_type").alias("item_a"), F.col("n").alias("na"))
    nb = n.select(F.col("event_type").alias("item_b"), F.col("n").alias("nb"))
    return (
        co.join(F.broadcast(na), "item_a")
        .join(F.broadcast(nb), "item_b")
        .select(
            "item_a",
            "item_b",
            F.col("co").cast("bigint").alias("n_co_users"),
            F.round(
                F.col("co") / (F.sqrt("na") * F.sqrt("nb")), 6
            ).alias("cosine"),
        )
        .orderBy("item_a", "item_b")
    )


def _als_oracle() -> str:
    y1 = " ".join(
        f"WHEN '{t}' THEN CAST({v[0]} AS DOUBLE)" for t, v in _ALS_ITEMS.items()
    )
    y2 = " ".join(
        f"WHEN '{t}' THEN CAST({v[1]} AS DOUBLE)" for t, v in _ALS_ITEMS.items()
    )
    return f"""
    WITH r AS (
        SELECT user_id, event_type,
               CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS r
        FROM events
        WHERE user_id % {_ALS_USER_MOD} = 0
        GROUP BY user_id, event_type),
    yr AS (
        SELECT user_id, r,
               (CASE event_type {y1} END) AS y1,
               (CASE event_type {y2} END) AS y2
        FROM r),
    norm AS (
        SELECT user_id,
               CAST(SUM(CAST(y1 * y1 AS DECIMAL(38,12))) AS DOUBLE)
                   + {_ALS_LAMBDA} AS a11,
               CAST(SUM(CAST(y1 * y2 AS DECIMAL(38,12))) AS DOUBLE) AS a12,
               CAST(SUM(CAST(y2 * y2 AS DECIMAL(38,12))) AS DOUBLE)
                   + {_ALS_LAMBDA} AS a22,
               CAST(SUM(CAST(r * y1 AS DECIMAL(38,12))) AS DOUBLE) AS b1,
               CAST(SUM(CAST(r * y2 AS DECIMAL(38,12))) AS DOUBLE) AS b2,
               CAST(COUNT(*) AS BIGINT) AS n_items
        FROM yr GROUP BY user_id)
    SELECT user_id, n_items,
           ROUND((a22 * b1 - a12 * b2) / (a11 * a22 - a12 * a12), 6) AS w1,
           ROUND((a11 * b2 - a12 * b1) / (a11 * a22 - a12 * a12), 6) AS w2
    FROM norm
    ORDER BY user_id
    """


@query("als_user_factors_one_step", oracle=_als_oracle())
def als_user_factors_one_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One exact ALS half-step (k=2): with the 5 item factors fixed,
    each user's latent vector solves (YᵀY + λI) w = Yᵀr in closed form
    via the 2x2 determinant inverse — the per-user independent solve
    that makes ALS the canonical embarrassingly-parallel recommender
    trainer. Users are subsampled by key (user_id % {_ALS_USER_MOD}) to
    bound the audited output; the plan is identical unsampled.

    Ratings reduce per (user, item) with DECIMAL sums; every normal-
    equation accumulation also runs through DECIMAL, so A, b, and the
    solved factors are bit-identical across engines. One shuffle on
    user_id; item factors are CASE literals — no join for Y at all."""
    e = table(spark, sf_dir, "events").filter(
        F.col("user_id") % _ALS_USER_MOD == 0
    )
    r = e.groupBy("user_id", "event_type").agg(
        F.sum(F.col("value").cast("decimal(38,6)")).cast("double").alias("r")
    )
    y1 = F.lit(None).cast("double")
    y2 = F.lit(None).cast("double")
    y1_expr, y2_expr = None, None
    for t, (v1, v2) in _ALS_ITEMS.items():
        c = F.col("event_type") == t
        y1_expr = F.when(c, v1) if y1_expr is None else y1_expr.when(c, v1)
        y2_expr = F.when(c, v2) if y2_expr is None else y2_expr.when(c, v2)
    yr = r.select("user_id", "r", y1_expr.alias("y1"), y2_expr.alias("y2"))

    def dsum12(col):
        return F.sum(col.cast("decimal(38,12)")).cast("double")

    norm = yr.groupBy("user_id").agg(
        (dsum12(F.col("y1") * F.col("y1")) + _ALS_LAMBDA).alias("a11"),
        dsum12(F.col("y1") * F.col("y2")).alias("a12"),
        (dsum12(F.col("y2") * F.col("y2")) + _ALS_LAMBDA).alias("a22"),
        dsum12(F.col("r") * F.col("y1")).alias("b1"),
        dsum12(F.col("r") * F.col("y2")).alias("b2"),
        F.count(F.lit(1)).cast("bigint").alias("n_items"),
    )
    det = F.col("a11") * F.col("a22") - F.col("a12") * F.col("a12")
    return norm.select(
        "user_id",
        "n_items",
        F.round((F.col("a22") * F.col("b1") - F.col("a12") * F.col("b2")) / det, 6).alias("w1"),
        F.round((F.col("a11") * F.col("b2") - F.col("a12") * F.col("b1")) / det, 6).alias("w2"),
    ).orderBy("user_id")


_OPE_ARMS = ("click", "error", "purchase", "signup", "view")  # alphabetical


@query(
    "ope_ips_estimate",
    oracle=f"""
    WITH logged AS (
        SELECT user_id, event_type, value FROM events),
    prop AS (
        SELECT event_type,
               CAST(COUNT(*) AS DOUBLE) / SUM(COUNT(*)) OVER () AS p
        FROM logged GROUP BY event_type),
    scored AS (
        SELECT l.value,
               CASE WHEN l.event_type =
                    (['click','error','purchase','signup','view'])
                        [CAST(l.user_id % 5 AS INT) + 1]
                    THEN 1.0 ELSE 0.0 END AS match,
               pr.p
        FROM logged l JOIN prop pr ON pr.event_type = l.event_type)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_logged,
           ROUND(CAST(SUM(CAST(match * value / p AS DECIMAL(38,12)))
                      AS DOUBLE) / COUNT(*), 6) AS ips_value,
           ROUND(CAST(SUM(CAST(match * value / p AS DECIMAL(38,12)))
                      AS DOUBLE)
                 / CAST(SUM(CAST(match / p AS DECIMAL(38,12))) AS DOUBLE), 6)
               AS snips_value,
           ROUND(CAST(SUM(CAST(match / p AS DECIMAL(38,12))) AS DOUBLE)
                 / COUNT(*), 6) AS effective_weight
    FROM scored
    """,
)
def ope_ips_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Off-policy evaluation by inverse-propensity scoring: estimate the
    value a deterministic target policy (arm chosen by user-id hash)
    WOULD have earned from the logged event stream, reweighting each
    logged (action, reward) by 1/propensity — plus the self-normalized
    (SNIPS) variant that tames weight variance. This is how recommender
    and bandit policies are evaluated before any A/B traffic exists.

    Propensities are the arms' empirical shares (5-row broadcast);
    matching and reweighting happen inside the one logged-data scan;
    every weighted sum accumulates in DECIMAL so both engines agree
    bit-for-bit before rounding."""
    logged = table(spark, sf_dir, "events").select(
        "user_id", "event_type", "value"
    )
    prop = logged.groupBy("event_type").agg(
        (
            F.count(F.lit(1)).cast("double")
            / F.sum(F.count(F.lit(1))).over(Window.partitionBy())
        ).alias("p")
    )
    target = None
    for i, arm in enumerate(_OPE_ARMS):
        c = F.col("user_id") % 5 == i
        target = F.when(c, arm) if target is None else target.when(c, arm)
    scored = logged.join(F.broadcast(prop), "event_type").select(
        "value",
        F.when(F.col("event_type") == target, 1.0).otherwise(0.0).alias("match"),
        "p",
    )

    def dsum12(col):
        return F.sum(col.cast("decimal(38,12)")).cast("double")

    return scored.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_logged"),
        F.round(
            dsum12(F.col("match") * F.col("value") / F.col("p")) / F.count("*"),
            6,
        ).alias("ips_value"),
        F.round(
            dsum12(F.col("match") * F.col("value") / F.col("p"))
            / dsum12(F.col("match") / F.col("p")),
            6,
        ).alias("snips_value"),
        F.round(
            dsum12(F.col("match") / F.col("p")) / F.count("*"), 6
        ).alias("effective_weight"),
    )


@query(
    "bandit_ucb1_allocation",
    oracle="""
    WITH arms AS (
        SELECT event_type AS arm,
               COUNT(*) AS n_pulls,
               CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*)
                   AS mean_reward
        FROM events GROUP BY event_type),
    tot AS (SELECT CAST(SUM(n_pulls) AS BIGINT) AS n FROM arms)
    SELECT a.arm, a.n_pulls,
           ROUND(a.mean_reward, 6) AS mean_reward,
           ROUND(a.mean_reward + SQRT(2 * LN(t.n) / a.n_pulls), 6) AS ucb1,
           RANK() OVER (ORDER BY a.mean_reward + SQRT(2 * LN(t.n) / a.n_pulls)
                            DESC, a.arm) AS play_priority
    FROM arms a, tot t
    """,
)
def bandit_ucb1_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UCB1 bandit allocation from logged rewards: per-arm mean reward
    plus the sqrt(2 ln N / n_a) exploration bonus, ranked into the next
    play order — the optimism-under-uncertainty step that pairs with
    the off-policy evaluator (ope_ips_estimate).

    One (count, DECIMAL-sum) aggregate per arm and a 1-row totals
    broadcast; the ranking window runs over the |arms| frame (5 rows),
    never facts. At any corpus size this is a single collapsing pass."""
    e = table(spark, sf_dir, "events")
    arms = e.groupBy(F.col("event_type").alias("arm")).agg(
        F.count(F.lit(1)).alias("n_pulls"),
        (
            F.sum(F.col("value").cast("decimal(38,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("mean_reward"),
    )
    tot = arms.agg(F.sum("n_pulls").alias("n"))
    ucb = F.col("mean_reward") + F.sqrt(2 * F.log(F.col("n")) / F.col("n_pulls"))
    w = Window.orderBy(ucb.desc(), F.col("arm").asc())
    return arms.crossJoin(F.broadcast(tot)).select(
        "arm",
        "n_pulls",
        F.round("mean_reward", 6).alias("mean_reward"),
        F.round(ucb, 6).alias("ucb1"),
        F.rank().over(w).alias("play_priority"),
    )
