"""Topic modeling: one exact EM step of PLSA (probabilistic latent
semantic analysis), expressed relationally.

The reference delegates all querying to DuckDB and has no topic
modeling; this extends the corpus-analysis surface with the classic
Hofmann PLSA E/M step — the building block of topic-model training and
the simplest "what is this corpus about" summarizer that goes beyond
term counting (collocations_pmi_top, text_term_frequency).

Design for 100 TB:
- the doc-term matrix is restricted to the top-V corpus vocabulary
  (V=50 here), so every marginal is vocabulary-bounded: the E-step
  fanout is |ndw| x Z rows and the M-step reduces straight back to
  V x Z;
- topic priors are DETERMINISTIC functions of (vocab rank, topic) and
  (doc_id, topic) — integer formulas, no stored init, reproducible on
  any engine. All E-step responsibilities are exact rationals of
  integers evaluated identically in both engines;
- M-step numerators accumulate in DECIMAL(38,12), so the
  order-dependent float-sum hazard of a distributed reduce is gone.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table
from ..functions.textfns import tokens
from ..registry import query

_V = 50  # vocabulary size
_Z = 3  # topics
_TOPK = 5  # reported tokens per topic

# unnormalized priors: integer formulas shared by both engines
# p(w|z) ~ 1 + (widx*7919 + z*104729) % 97      (depends on vocab rank)
# p(z|d) ~ 1 + (doc_id + z) % 5                 (depends on doc id)
_PW = "(1 + ({w} * 7919 + {z} * 104729) % 97)"
_PD = "(1 + ({d} + {z}) % 5)"


def _a(z: int, others: tuple[int, int]) -> str:
    """Unnormalized responsibility numerator a_z for topic z, scaled by
    the other topics' vocab normalizers so all three share one exact
    integer denominator: a_z = pw(w,z) * pd(d,z) * zw_i * zw_j."""
    zo1, zo2 = others
    return (
        f"({_PW.format(w='widx', z=z)} * {_PD.format(d='doc_id', z=z)}"
        f" * zw{zo1} * zw{zo2})"
    )


_A1 = _a(1, (2, 3))
_A2 = _a(2, (1, 3))
_A3 = _a(3, (1, 2))


@query(
    "plsa_em_step_topics",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
    vocab AS (
        SELECT w, ROW_NUMBER() OVER (ORDER BY n DESC, w ASC) AS widx
        FROM (SELECT w, COUNT(*) AS n FROM tok GROUP BY w)
        ORDER BY n DESC, w ASC LIMIT {_V}),
    zw AS (
        SELECT SUM({_PW.format(w='widx', z=1)}) AS zw1,
               SUM({_PW.format(w='widx', z=2)}) AS zw2,
               SUM({_PW.format(w='widx', z=3)}) AS zw3
        FROM vocab),
    ndw AS (
        SELECT t.doc_id, v.widx, v.w, COUNT(*) AS n
        FROM tok t JOIN vocab v USING (w)
        GROUP BY t.doc_id, v.widx, v.w),
    gam AS (
        SELECT d.widx, d.w, z.z,
               d.n * (CASE z.z WHEN 1 THEN {_A1} WHEN 2 THEN {_A2}
                               ELSE {_A3} END)
                   * 1.0 / ({_A1} + {_A2} + {_A3}) AS term
        FROM ndw d, zw, unnest(generate_series(1, {_Z})) AS z(z)),
    m AS (
        SELECT z, widx, w,
               SUM(CAST(term AS DECIMAL(38,12))) AS num
        FROM gam GROUP BY z, widx, w),
    den AS (SELECT z, SUM(num) AS den FROM m GROUP BY z),
    p AS (
        SELECT m.z, m.w,
               CAST(m.num AS DOUBLE) / CAST(d.den AS DOUBLE) AS pwz,
               ROW_NUMBER() OVER (PARTITION BY m.z
                                  ORDER BY m.num DESC, m.w ASC) AS rn
        FROM m JOIN den d USING (z))
    SELECT z, w AS token, ROUND(pwz, 6) AS p_w_given_z
    FROM p WHERE rn <= {_TOPK}
    ORDER BY z, p_w_given_z DESC, token
    """,
)
def plsa_em_step_topics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One exact PLSA EM step over the top-{V} vocabulary, reporting the
    {K} highest-probability tokens per topic after the M-step update.

    E-step responsibilities gamma(z | d, w) are exact rationals of the
    integer priors (the doc-side normalizer cancels; the vocab-side
    normalizers are cleared by cross-multiplying), so both engines
    compute bit-identical doubles. The M-step re-estimate
    p(w|z) = sum_d n(d,w) gamma / normalizer accumulates in DECIMAL.
    Plan shape: tokenize/count shuffle on the term key, vocab + its
    3 normalizers broadcast back, E-step fanout is x{Z} map-side,
    M-step reduces to V x Z rows — no stage ever carries more than
    |ndw| x {Z} rows, and every reduce is vocabulary-bounded."""
    d = table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    tok = d.select("doc_id", F.explode(tokens("text")).alias("w"))
    counts = tok.groupBy("w").agg(F.count(F.lit(1)).alias("n"))
    # 50-row frame: the global window is over the LIMITed head, not data
    vocab = (
        counts.orderBy(F.col("n").desc(), F.col("w").asc())
        .limit(_V)
        .withColumn(
            "widx",
            F.row_number().over(Window.orderBy(F.col("n").desc(), F.col("w").asc())),
        )
        .select("w", "widx")
    )
    zw = vocab.agg(
        *[
            F.sum(F.expr(_PW.format(w="widx", z=z))).alias(f"zw{z}")
            for z in (1, 2, 3)
        ]
    )
    ndw = (
        tok.join(F.broadcast(vocab), "w")
        .groupBy("doc_id", "widx", "w")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    base = ndw.crossJoin(F.broadcast(zw))
    terms = base.select(
        "widx",
        "w",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(z).alias("z"),
                        (
                            F.col("n")
                            * F.expr(a)
                            * F.lit(1.0)
                            / F.expr(f"({_A1} + {_A2} + {_A3})")
                        ).alias("term"),
                    )
                    for z, a in ((1, _A1), (2, _A2), (3, _A3))
                ]
            )
        ).alias("zt"),
    ).select("widx", "w", F.col("zt.z").alias("z"), F.col("zt.term").alias("term"))
    m = terms.groupBy("z", "widx", "w").agg(
        F.sum(F.col("term").cast("decimal(38,12)")).alias("num")
    )
    den = m.groupBy("z").agg(F.sum("num").alias("den"))
    w_rank = Window.partitionBy("z").orderBy(F.col("num").desc(), F.col("w").asc())
    return (
        m.join(F.broadcast(den), "z")
        .withColumn("rn", F.row_number().over(w_rank))
        .filter(F.col("rn") <= _TOPK)
        .select(
            "z",
            F.col("w").alias("token"),
            F.round(
                F.col("num").cast("double") / F.col("den").cast("double"), 6
            ).alias("p_w_given_z"),
        )
        .orderBy("z", F.col("p_w_given_z").desc(), "token")
    )


plsa_em_step_topics.__doc__ = plsa_em_step_topics.__doc__.format(
    V=_V, K=_TOPK, Z=_Z
)
