"""Retrieval-evaluation metrics: NDCG@k, MRR@k, recall@k over a ranked run.

A retrieval/embedding pipeline is only as good as its eval loop, and at
corpus scale the eval itself is a distributed job: score every
(query, candidate) pair the run produced, join ground-truth labels, and
reduce to per-query ranking metrics. The shapes here are the standard
ones (TREC eval / BEIR):

- **Ranking** comes from exact cosine against each query vector. The
  query set is tiny (``N_QUERIES`` vectors) and rides a broadcast; the
  candidate corpus streams through one scan per metric family — scoring
  is dot/norm arithmetic inside whole-stage codegen, never a UDF.
- **Ground truth** is label equality (``embeddings.label``), the usual
  proxy when explicit qrels are absent.
- **Determinism**: ranks order by ``(ROUND(cosine, 6) DESC, vec_id)`` in
  BOTH engines, so float noise below 1e-6 cannot flip a rank and the
  DuckDB oracle reproduces the run bit-for-bit.

At 100 TB the plan is unchanged: Q queries broadcast against the corpus
scan (no shuffle of the corpus), per-query TakeOrdered keeps k rows, and
the metric reduction touches Q*k rows — driver-side work is zero.

The reference has no evaluation surface (it stops at ingest); these are
north-star extension operators over the ``embeddings`` table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table
from ..functions.textfns import shingles, tokens
from ..functions.vector import dot, l2_norm
from ..registry import query

N_QUERIES = 5  # vec_id 0..4 act as queries
K = 10

# Shared ranked-run CTE: per query, candidates ranked by rounded cosine.
_RUN_CTE = f"""
    WITH q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv, label AS qlabel
               FROM embeddings WHERE vec_id < {N_QUERIES}),
    scored AS (
        SELECT q.qid, q.qlabel, e.vec_id, e.label,
               ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv), 6) AS cosine
        FROM embeddings e, q
        WHERE e.vec_id >= {N_QUERIES}
    ),
    ranked AS (
        SELECT qid, qlabel, vec_id, label, cosine,
               ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cosine DESC, vec_id) AS rnk
        FROM scored
    ),
    nrel AS (
        SELECT qid, COUNT(*) AS n_rel
        FROM scored WHERE label = qlabel GROUP BY qid
    )
"""


def _ranked_run(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(qid, qlabel, vec_id, label, cosine, rnk) for every candidate.

    Queries broadcast (N_QUERIES rows); candidates never shuffle before
    the per-query ranking window, which partitions on qid — Q partitions,
    each a corpus-sized sort only because we rank the FULL run here for
    metric exactness. The k-truncated variants below cut that to
    TakeOrdered per query."""
    emb = table(spark, sf_dir, "embeddings")
    q = (
        emb.filter(F.col("vec_id") < N_QUERIES)
        .select(
            F.col("vec_id").alias("qid"),
            F.col("embedding").cast("array<double>").alias("qv"),
            F.col("label").alias("qlabel"),
        )
    )
    cand = emb.filter(F.col("vec_id") >= N_QUERIES).select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("emb")
    )
    scored = cand.crossJoin(F.broadcast(q)).select(
        "qid",
        "qlabel",
        "vec_id",
        "label",
        F.round(
            dot("emb", F.col("qv")) / (l2_norm("emb") * l2_norm(F.col("qv"))), 6
        ).alias("cosine"),
    )
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return scored.withColumn("rnk", F.row_number().over(w))


@query(
    "eval_ndcg_at_k",
    oracle=_RUN_CTE
    + f"""
    SELECT r.qid,
           ROUND(SUM(CASE WHEN r.rnk <= {K} AND r.label = r.qlabel
                          THEN 1.0 / LOG2(r.rnk + 1) ELSE 0 END)
                 / MAX(i.idcg), 6) AS ndcg_at_k
    FROM ranked r
    JOIN (SELECT n.qid,
                 SUM(1.0 / LOG2(gs.g + 1)) AS idcg
          FROM nrel n, generate_series(1, {K}) AS gs(g)
          WHERE gs.g <= LEAST(n.n_rel, {K})
          GROUP BY n.qid) i ON i.qid = r.qid
    GROUP BY r.qid
    ORDER BY r.qid
    """,
)
def eval_ndcg_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-relevance NDCG@10 per query over the exact-cosine run.

    DCG accumulates 1/log2(rank+1) over relevant hits in the top k; the
    ideal DCG closed form needs only n_rel (one count per query), so no
    second ranking pass exists. Everything after the scored scan touches
    Q*k + Q rows."""
    run = _ranked_run(spark, sf_dir)
    dcg = run.filter(F.col("rnk") <= K).groupBy("qid").agg(
        F.sum(
            F.when(
                F.col("label") == F.col("qlabel"),
                F.lit(1.0) / F.log2(F.col("rnk") + F.lit(1)),
            ).otherwise(F.lit(0.0))
        ).alias("dcg")
    )
    # closed-form IDCG from n_rel: sum_{r=1..min(n_rel,k)} 1/log2(r+1)
    nrel = (
        run.filter(F.col("label") == F.col("qlabel"))
        .groupBy("qid")
        .agg(F.count(F.lit(1)).alias("n_rel"))
    )
    idcg = nrel.select(
        "qid",
        F.aggregate(
            F.sequence(F.lit(1), F.least(F.col("n_rel"), F.lit(K)).cast("int")),
            F.lit(0.0),
            lambda acc, r: acc + F.lit(1.0) / F.log2(r.cast("double") + F.lit(1.0)),
        ).alias("idcg"),
    )
    return (
        dcg.join(idcg.hint("shuffle_hash"), "qid")
        .select("qid", F.round(F.col("dcg") / F.col("idcg"), 6).alias("ndcg_at_k"))
        .orderBy("qid")
    )


@query(
    "eval_mrr_recall_at_k",
    oracle=_RUN_CTE
    + f"""
    SELECT r.qid,
           ROUND(COALESCE(MAX(CASE WHEN r.label = r.qlabel AND r.rnk <= {K}
                                   THEN 1.0 / r.rnk END), 0), 6) AS mrr_at_k,
           ROUND(CAST(SUM(CASE WHEN r.label = r.qlabel AND r.rnk <= {K}
                               THEN 1 ELSE 0 END) AS DOUBLE)
                 / LEAST(MAX(n.n_rel), {K}), 6) AS recall_at_k
    FROM ranked r JOIN nrel n ON n.qid = r.qid
    GROUP BY r.qid
    ORDER BY r.qid
    """,
)
def eval_mrr_recall_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MRR@10 and (capped) recall@10 per query, one aggregate over the run.

    MRR is MAX(1/rank) over relevant top-k hits — no per-query argmin
    pass; recall divides top-k hits by min(n_rel, k) so a query with 50
    relevant docs is not penalized for a k=10 cutoff."""
    run = _ranked_run(spark, sf_dir)
    hit = (F.col("label") == F.col("qlabel")) & (F.col("rnk") <= K)
    agg = run.groupBy("qid").agg(
        F.round(
            F.coalesce(
                F.max(F.when(hit, F.lit(1.0) / F.col("rnk"))), F.lit(0.0)
            ),
            6,
        ).alias("mrr_at_k"),
        F.sum(F.when(hit, 1).otherwise(0)).alias("hits"),
        F.sum(F.when(F.col("label") == F.col("qlabel"), 1).otherwise(0)).alias(
            "n_rel"
        ),
    )
    return agg.select(
        "qid",
        "mrr_at_k",
        F.round(
            F.col("hits").cast("double") / F.least(F.col("n_rel"), F.lit(K)), 6
        ).alias("recall_at_k"),
    ).orderBy("qid")


@query(
    "eval_knn_label_accuracy",
    oracle=_RUN_CTE
    + f"""
    , votes AS (
        SELECT qid, qlabel, label, COUNT(*) AS n_votes
        FROM ranked WHERE rnk <= {K}
        GROUP BY qid, qlabel, label
    )
    SELECT qid, qlabel, label AS predicted_label, n_votes,
           (label = qlabel) AS correct
    FROM votes
    QUALIFY ROW_NUMBER() OVER (PARTITION BY qid ORDER BY n_votes DESC, label) = 1
    ORDER BY qid
    """,
)
def eval_knn_label_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN classification eval: majority label among the top-k cosine
    neighbors vs the query's own label.

    The closed loop for embedding-quality monitoring — if k-NN accuracy
    over held-out labels drops after a retrain, the embedding regressed.
    Adds one Q*k-row vote count + one Q-partition argmax window on top
    of the shared ranked run; ties break on the smaller label id in
    both engines."""
    run = _ranked_run(spark, sf_dir)
    votes = (
        run.filter(F.col("rnk") <= K)
        .groupBy("qid", "qlabel", "label")
        .agg(F.count(F.lit(1)).alias("n_votes"))
    )
    w = Window.partitionBy("qid").orderBy(F.col("n_votes").desc(), F.col("label"))
    return (
        votes.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "qid",
            "qlabel",
            F.col("label").alias("predicted_label"),
            "n_votes",
            (F.col("label") == F.col("qlabel")).alias("correct"),
        )
        .orderBy("qid")
    )


@query(
    "eval_cohens_kappa",
    oracle=r"""
    WITH rated AS (
        SELECT doc_id,
               (n_chars >= 300) AS a_hi,
               (CAST(len(list_distinct(string_split_regex(text, '\s+')))
                     AS DOUBLE)
                / len(string_split_regex(text, '\s+')) >= 0.45) AS b_hi
        FROM documents),
    conf AS (
        SELECT CAST(COUNT(*) AS DOUBLE) AS n,
               CAST(SUM(CASE WHEN a_hi AND b_hi THEN 1 ELSE 0 END) AS DOUBLE) AS yy,
               CAST(SUM(CASE WHEN a_hi AND NOT b_hi THEN 1 ELSE 0 END) AS DOUBLE) AS yn,
               CAST(SUM(CASE WHEN NOT a_hi AND b_hi THEN 1 ELSE 0 END) AS DOUBLE) AS ny,
               CAST(SUM(CASE WHEN NOT a_hi AND NOT b_hi THEN 1 ELSE 0 END) AS DOUBLE) AS nn
        FROM rated)
    SELECT CAST(n AS BIGINT) AS n,
           CAST(yy AS BIGINT) AS n_both_hi,
           CAST(nn AS BIGINT) AS n_both_lo,
           ROUND((yy + nn) / n, 6) AS po,
           ROUND(((yy + yn) * (yy + ny) + (ny + nn) * (yn + nn)) / (n * n), 6) AS pe,
           ROUND(((yy + nn) / n
                  - ((yy + yn) * (yy + ny) + (ny + nn) * (yn + nn)) / (n * n))
                 / (1 - ((yy + yn) * (yy + ny) + (ny + nn) * (yn + nn)) / (n * n)),
                 6) AS kappa
    FROM conf
    """,
)
def eval_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-annotator agreement (Cohen's kappa) between two independent
    document-quality raters: a length gate (n_chars >= 300) and a
    lexical-diversity gate (distinct-word ratio >= 0.45). Kappa corrects
    raw agreement for chance — the number you report before trusting a
    heuristic labeler enough to distill it into training labels.

    One scan computes both ratings and the 2x2 confusion matrix in a
    single global aggregate (map-side partials; four counters cross the
    wire per partition); the closed form runs on the 1-row frame. Counts
    are exactly representable doubles, so po/pe/kappa are bit-stable
    across engines before rounding."""
    d = table(spark, sf_dir, "documents")
    words = F.split(F.col("text"), r"\s+")
    rated = d.select(
        (F.col("n_chars") >= 300).alias("a_hi"),
        (
            F.size(F.array_distinct(words)).cast("double") / F.size(words) >= 0.45
        ).alias("b_hi"),
    )
    conf = rated.agg(
        F.count("*").cast("double").alias("n"),
        F.sum(F.when(F.col("a_hi") & F.col("b_hi"), 1).otherwise(0))
        .cast("double")
        .alias("yy"),
        F.sum(F.when(F.col("a_hi") & ~F.col("b_hi"), 1).otherwise(0))
        .cast("double")
        .alias("yn"),
        F.sum(F.when(~F.col("a_hi") & F.col("b_hi"), 1).otherwise(0))
        .cast("double")
        .alias("ny"),
        F.sum(F.when(~F.col("a_hi") & ~F.col("b_hi"), 1).otherwise(0))
        .cast("double")
        .alias("nn"),
    )
    po = (F.col("yy") + F.col("nn")) / F.col("n")
    pe = (
        (F.col("yy") + F.col("yn")) * (F.col("yy") + F.col("ny"))
        + (F.col("ny") + F.col("nn")) * (F.col("yn") + F.col("nn"))
    ) / (F.col("n") * F.col("n"))
    return conf.select(
        F.col("n").cast("bigint").alias("n"),
        F.col("yy").cast("bigint").alias("n_both_hi"),
        F.col("nn").cast("bigint").alias("n_both_lo"),
        F.round(po, 6).alias("po"),
        F.round(pe, 6).alias("pe"),
        F.round((po - pe) / (1 - pe), 6).alias("kappa"),
    )


@query(
    "eval_rouge2_pairs",
    oracle="""
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    big AS (
        SELECT doc_id, array_to_string(w[i:i+1], ' ') AS bg,
               CAST(COUNT(*) AS DOUBLE) AS c
        FROM w, unnest(generate_series(1, len(w) - 1)) AS t(i)
        GROUP BY doc_id, bg),
    tot AS (SELECT doc_id, SUM(c) AS t FROM big GROUP BY doc_id),
    ov AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               SUM(LEAST(a.c, b.c)) AS o
        FROM big a JOIN big b ON b.doc_id = a.doc_id + 1 AND b.bg = a.bg
        WHERE a.doc_id % 2 = 0
        GROUP BY 1, 2)
    SELECT ov.doc_a, ov.doc_b,
           CAST(ov.o AS BIGINT) AS overlap_bigrams,
           ROUND(ov.o / ta.t, 6) AS rouge2_p,
           ROUND(ov.o / tb.t, 6) AS rouge2_r,
           ROUND(2.0 * (ov.o / ta.t) * (ov.o / tb.t)
                 / ((ov.o / ta.t) + (ov.o / tb.t)), 6) AS rouge2_f1
    FROM ov
    JOIN tot ta ON ta.doc_id = ov.doc_a
    JOIN tot tb ON tb.doc_id = ov.doc_b
    ORDER BY ROUND(2.0 * (ov.o / ta.t) * (ov.o / tb.t)
                   / ((ov.o / ta.t) + (ov.o / tb.t)), 6) DESC, ov.doc_a
    LIMIT 20
    """,
)
def eval_rouge2_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROUGE-2 precision/recall/F1 between fixed candidate/reference
    document pairs (even doc_id scored against its successor) — the
    n-gram-overlap metric used to audit summarization / paraphrase
    training pairs at corpus scale, with proper CLIPPED multiset
    counts (each reference bigram credits at most its own frequency).

    Plan: one bigram-multiset aggregate per document, then the overlap
    is an equi-join keyed on (pair, bigram) — candidate pairing is by
    key arithmetic, so no similarity search and no quadratic stage;
    per-doc totals join back on the doc key. All counts are integers in
    doubles, so P/R/F1 are bit-stable before rounding."""
    d = table(spark, sf_dir, "documents").select("doc_id", tokens("text").alias("w"))
    big = (
        d.select("doc_id", F.explode(shingles(F.col("w"), 2)).alias("bg"))
        .groupBy("doc_id", "bg")
        .agg(F.count(F.lit(1)).cast("double").alias("c"))
    )
    tot = big.groupBy("doc_id").agg(F.sum("c").alias("t"))
    a = big.filter(F.col("doc_id") % 2 == 0).select(
        F.col("doc_id").alias("doc_a"), "bg", F.col("c").alias("ca")
    )
    b = big.filter(F.col("doc_id") % 2 == 1).select(
        (F.col("doc_id") - 1).alias("doc_a"),
        F.col("doc_id").alias("doc_b"),
        "bg",
        F.col("c").alias("cb"),
    )
    ov = (
        a.join(b, ["doc_a", "bg"])
        .groupBy("doc_a", "doc_b")
        .agg(F.sum(F.least("ca", "cb")).alias("o"))
    )
    ta = tot.select(F.col("doc_id").alias("doc_a"), F.col("t").alias("ta"))
    tb = tot.select(F.col("doc_id").alias("doc_b"), F.col("t").alias("tb"))
    p = F.col("o") / F.col("ta")
    r = F.col("o") / F.col("tb")
    f1 = 2.0 * p * r / (p + r)
    return (
        ov.join(ta, "doc_a")
        .join(tb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.col("o").cast("bigint").alias("overlap_bigrams"),
            F.round(p, 6).alias("rouge2_p"),
            F.round(r, 6).alias("rouge2_r"),
            F.round(f1, 6).alias("rouge2_f1"),
        )
        .orderBy(F.col("rouge2_f1").desc(), "doc_a")
        .limit(20)
    )


_MRL_SUBDIM = 16  # truncated prefix length (Matryoshka-style)


@query(
    "eval_matryoshka_truncation",
    oracle=f"""
    WITH q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qe
               FROM embeddings WHERE vec_id < {N_QUERIES}),
    c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
          FROM embeddings WHERE vec_id >= {N_QUERIES}),
    full_rank AS (
        SELECT q.qid, c.vec_id,
               ROW_NUMBER() OVER (
                   PARTITION BY q.qid
                   ORDER BY ROUND(list_cosine_similarity(c.e, q.qe), 6) DESC,
                            c.vec_id) AS rnk
        FROM c, q),
    trunc_rank AS (
        SELECT q.qid, c.vec_id,
               ROW_NUMBER() OVER (
                   PARTITION BY q.qid
                   ORDER BY ROUND(list_cosine_similarity(
                                c.e[1:{_MRL_SUBDIM}],
                                q.qe[1:{_MRL_SUBDIM}]), 6) DESC,
                            c.vec_id) AS rnk
        FROM c, q)
    SELECT f.qid,
           CAST(COUNT(*) AS BIGINT) AS overlap_at_{K},
           ROUND(COUNT(*) * 1.0 / ({K} * 2 - COUNT(*)), 6) AS jaccard_at_{K}
    FROM (SELECT qid, vec_id FROM full_rank WHERE rnk <= {K}) f
    JOIN (SELECT qid, vec_id FROM trunc_rank WHERE rnk <= {K}) t
      ON t.qid = f.qid AND t.vec_id = f.vec_id
    GROUP BY f.qid
    ORDER BY f.qid
    """,
)
def eval_matryoshka_truncation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Truncation-fidelity eval for Matryoshka-style embeddings: per
    query, the top-{K} overlap (and Jaccard) between neighbors ranked
    by the FULL 64-d cosine and by the first-{_MRL_SUBDIM}-dims cosine
    — the measurement that decides whether you can serve the cheap
    truncated index and keep the full vectors only for rerank.

    Both rankings share the broadcast-query/corpus-scan topology of the
    retrieval evals; ranks order by (rounded cosine, vec_id) so the
    comparison is engine-exact. Overlap joins on (query, candidate) —
    Q*k rows a side."""
    emb = table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").cast("array<double>").alias("qe"),
    )
    c = emb.filter(F.col("vec_id") >= N_QUERIES).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )

    def ranked(qe_col, e_col):
        cos = F.round(
            dot(e_col, qe_col) / (l2_norm(e_col) * l2_norm(qe_col)), 6
        )
        w = Window.partitionBy("qid").orderBy(cos.desc(), F.col("vec_id"))
        return (
            c.crossJoin(F.broadcast(q))
            .withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= K)
            .select("qid", "vec_id")
        )

    full = ranked(F.col("qe"), F.col("e"))
    trunc = ranked(
        F.slice(F.col("qe"), 1, _MRL_SUBDIM), F.slice(F.col("e"), 1, _MRL_SUBDIM)
    )
    return (
        full.join(trunc, ["qid", "vec_id"])
        .groupBy("qid")
        .agg(F.count(F.lit(1)).cast("bigint").alias(f"overlap_at_{K}"))
        .select(
            "qid",
            f"overlap_at_{K}",
            F.round(
                F.col(f"overlap_at_{K}")
                * 1.0
                / (K * 2 - F.col(f"overlap_at_{K}")),
                6,
            ).alias(f"jaccard_at_{K}"),
        )
        .orderBy("qid")
    )


@query(
    "cv_kfold_gap",
    oracle="""
    WITH folds AS (
        SELECT user_id % 5 AS fold,
               SUM(CAST(value AS DECIMAL(38,6))) AS s,
               COUNT(*) AS n
        FROM events GROUP BY user_id % 5),
    tot AS (SELECT SUM(s) AS st, SUM(n) AS nt FROM folds)
    SELECT f.fold,
           f.n AS n_holdout,
           ROUND(CAST(t.st - f.s AS DOUBLE) / (t.nt - f.n), 6) AS mean_train,
           ROUND(CAST(f.s AS DOUBLE) / f.n, 6)                 AS mean_holdout,
           ROUND(CAST(f.s AS DOUBLE) / f.n
                 - CAST(t.st - f.s AS DOUBLE) / (t.nt - f.n), 6) AS gap
    FROM folds f, tot t
    ORDER BY f.fold
    """,
)
def cv_kfold_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-fold cross-validation statistics from ONE scan: per-fold
    holdout mean vs the complementary train-folds mean, via the
    global-minus-fold identity (train_f = (S_total - S_f)/(N_total -
    N_f)) — k-fold CV never needs k passes over the data for additive
    statistics.

    Folds are a deterministic key hash (reproducible splits, no stored
    assignment); the corpus reduces to 5 (sum, count) partials, totals
    are a 1-row broadcast, and all k train/holdout estimates are
    constant-size arithmetic on top. DECIMAL accumulation keeps the
    subtraction exact across engines."""
    e = table(spark, sf_dir, "events")
    folds = e.groupBy((F.col("user_id") % 5).alias("fold")).agg(
        F.sum(F.col("value").cast("decimal(38,6)")).alias("s"),
        F.count(F.lit(1)).alias("n"),
    )
    tot = folds.agg(F.sum("s").alias("st"), F.sum("n").alias("nt"))
    mean_train = (F.col("st") - F.col("s")).cast("double") / (F.col("nt") - F.col("n"))
    mean_holdout = F.col("s").cast("double") / F.col("n")
    return (
        folds.crossJoin(F.broadcast(tot))
        .select(
            "fold",
            F.col("n").alias("n_holdout"),
            F.round(mean_train, 6).alias("mean_train"),
            F.round(mean_holdout, 6).alias("mean_holdout"),
            F.round(mean_holdout - mean_train, 6).alias("gap"),
        )
        .orderBy("fold")
    )


@query(
    "eval_auc_exact",
    oracle="""
    WITH scored AS (
        SELECT (event_type = 'purchase') AS label,
               ROUND(1.0 / (1.0 + EXP(-(value / 100.0 - 2.0))), 9) AS score
        FROM events),
    per_s AS (
        SELECT score,
               CAST(COUNT(*) AS BIGINT) AS c,
               CAST(SUM(CASE WHEN label THEN 1 ELSE 0 END) AS BIGINT) AS cp
        FROM scored GROUP BY score),
    cum AS (
        SELECT score, c, cp,
               SUM(c) OVER (ORDER BY score) - c AS before
        FROM per_s),
    r AS (
        SELECT CAST(SUM(CAST(cp * (before + (c + 1) / 2.0) AS DECIMAL(38,6)))
                    AS DOUBLE) AS rpos
        FROM cum),
    tot AS (
        SELECT CAST(SUM(cp) AS BIGINT) AS np,
               CAST(SUM(c - cp) AS BIGINT) AS nn
        FROM per_s)
    SELECT t.np AS n_pos, t.nn AS n_neg,
           ROUND((r.rpos - t.np * (t.np + 1) / 2.0) / (t.np * 1.0 * t.nn), 6)
               AS auc
    FROM r, tot t
    """,
)
def eval_auc_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT ROC AUC of a classifier score against the purchase label,
    via the Mann-Whitney identity AUC = (R_pos - n_pos(n_pos+1)/2) /
    (n_pos * n_neg) with midrank tie handling — no threshold sweep, no
    sampling, and exact where the 20-bucket PR curve
    (eval_pr_curve_points) is binned.

    Average ranks come from per-distinct-score counts + the two-pass
    distributed prefix scan; the rank sum accumulates in DECIMAL.
    Scales with |distinct scores|, not rows — the standard exact-AUC
    plan for billion-row eval sets."""
    from ..functions.ranks import global_cumulative_sums

    e = table(spark, sf_dir, "events").select(
        (F.col("event_type") == "purchase").alias("label"),
        F.round(
            1.0 / (1.0 + F.exp(-(F.col("value") / 100.0 - 2.0))), 9
        ).alias("score"),
    )
    per_s = e.groupBy("score").agg(
        F.count(F.lit(1)).alias("c"),
        F.sum(F.when(F.col("label"), 1).otherwise(0)).cast("long").alias("cp"),
    )
    cum = global_cumulative_sums(per_s, [F.col("score")], ["c"]).withColumn(
        "before", F.col("cum_c") - F.col("c")
    )
    rpos = cum.agg(
        F.sum(
            (F.col("cp") * (F.col("before") + (F.col("c") + 1) / 2.0)).cast(
                "decimal(38,6)"
            )
        )
        .cast("double")
        .alias("rpos")
    )
    tot = per_s.agg(
        F.sum("cp").alias("np"), F.sum(F.col("c") - F.col("cp")).alias("nn")
    )
    return rpos.crossJoin(F.broadcast(tot)).select(
        F.col("np").alias("n_pos"),
        F.col("nn").alias("n_neg"),
        F.round(
            (F.col("rpos") - F.col("np") * (F.col("np") + 1) / 2.0)
            / (F.col("np") * 1.0 * F.col("nn")),
            6,
        ).alias("auc"),
    )


@query(
    "eval_cumulative_gains",
    oracle="""
    WITH scored AS (
        SELECT (event_type = 'purchase') AS label,
               ROUND(1.0 / (1.0 + EXP(-(value / 100.0 - 2.0))), 9) AS score,
               event_id
        FROM events),
    ranked AS (
        SELECT label,
               NTILE(10) OVER (ORDER BY score DESC, event_id ASC) AS decile
        FROM scored),
    per_d AS (
        SELECT decile,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN label THEN 1 ELSE 0 END) AS BIGINT) AS n_pos
        FROM ranked GROUP BY decile),
    tot AS (SELECT CAST(SUM(n_pos) AS BIGINT) AS tp,
                   CAST(SUM(n) AS BIGINT) AS tn FROM per_d)
    SELECT p.decile, p.n, p.n_pos,
           ROUND(SUM(p.n_pos) OVER (ORDER BY p.decile) * 1.0 / t.tp, 6)
               AS cum_gain,
           ROUND((SUM(p.n_pos) OVER (ORDER BY p.decile) * 1.0 / t.tp)
                 / (SUM(p.n) OVER (ORDER BY p.decile) * 1.0 / t.tn), 6)
               AS cum_lift
    FROM per_d p, tot t
    ORDER BY p.decile
    """,
)
def eval_cumulative_gains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative gains / lift table by score decile — the campaign-
    targeting readout ('the top 20% of scores captures X% of the
    positives') that complements the threshold view (eval_pr_curve)
    and the ranking view (eval_auc_exact).

    Score deciles are exact NTILE semantics computed via the two-pass
    distributed ranking (functions/ranks.py) — the facts never meet a
    single-partition window; the decile rollup is 10 rows, and the
    cumulative windows run on that 10-row frame."""
    from ..functions.ranks import global_row_number, ntile_from_rank

    scored = table(spark, sf_dir, "events").select(
        (F.col("event_type") == "purchase").alias("label"),
        F.round(
            1.0 / (1.0 + F.exp(-(F.col("value") / 100.0 - 2.0))), 9
        ).alias("score"),
        "event_id",
    )
    ranked, n = global_row_number(
        scored, [F.col("score").desc(), F.col("event_id").asc()]
    )
    per_d = (
        ranked.select(
            "label", ntile_from_rank(F.col("global_rn"), n, 10).alias("decile")
        )
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(F.col("label"), 1).otherwise(0)).cast("long").alias("n_pos"),
        )
    )
    tot = per_d.agg(F.sum("n_pos").alias("tp"), F.sum("n").alias("tn"))
    w = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    return (
        per_d.crossJoin(F.broadcast(tot))
        .select(
            "decile",
            "n",
            "n_pos",
            F.round(F.sum("n_pos").over(w) * 1.0 / F.col("tp"), 6).alias("cum_gain"),
            F.round(
                (F.sum("n_pos").over(w) * 1.0 / F.col("tp"))
                / (F.sum("n").over(w) * 1.0 / F.col("tn")),
                6,
            ).alias("cum_lift"),
        )
        .orderBy("decile")
    )


@query(
    "eval_macro_f1",
    oracle="""
    WITH scored AS (
        SELECT (event_type = 'purchase') AS label,
               (1.0 / (1.0 + EXP(-(value / 100.0 - 2.0)))) >= 0.5 AS pred
        FROM events),
    cells AS (
        SELECT CAST(SUM(CASE WHEN pred AND label THEN 1 ELSE 0 END) AS BIGINT) AS tp,
               CAST(SUM(CASE WHEN pred AND NOT label THEN 1 ELSE 0 END) AS BIGINT) AS fp,
               CAST(SUM(CASE WHEN NOT pred AND label THEN 1 ELSE 0 END) AS BIGINT) AS fn,
               CAST(SUM(CASE WHEN NOT pred AND NOT label THEN 1 ELSE 0 END) AS BIGINT) AS tn
        FROM scored),
    per_class AS (
        SELECT tp * 1.0 / (tp + fp) AS p_pos, tp * 1.0 / (tp + fn) AS r_pos,
               tn * 1.0 / (tn + fn) AS p_neg, tn * 1.0 / (tn + fp) AS r_neg,
               tp, fp, fn, tn
        FROM cells)
    SELECT tp, fp, fn, tn,
           ROUND(2 * p_pos * r_pos / (p_pos + r_pos), 6) AS f1_pos,
           ROUND(2 * p_neg * r_neg / (p_neg + r_neg), 6) AS f1_neg,
           ROUND((2 * p_pos * r_pos / (p_pos + r_pos)
                  + 2 * p_neg * r_neg / (p_neg + r_neg)) / 2, 6) AS macro_f1,
           ROUND((tp + tn) * 1.0 / (tp + fp + fn + tn), 6) AS accuracy
    FROM per_class
    """,
)
def eval_macro_f1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-class F1 and macro-F1 (plus accuracy) from one confusion
    aggregate — the class-imbalance-honest summary that accuracy alone
    hides (a 95%-negative dataset scores 0.95 accuracy on the constant
    classifier; macro-F1 exposes it). Completes the classification-eval
    set next to the threshold sweep (eval_pr_curve_points), ranking
    view (eval_auc_exact) and targeting view (eval_cumulative_gains).

    The entire confusion matrix is FOUR integer slots in a single
    two-phase aggregate; every downstream metric is closed-form on the
    1-row result."""
    e = table(spark, sf_dir, "events").select(
        (F.col("event_type") == "purchase").alias("label"),
        (1.0 / (1.0 + F.exp(-(F.col("value") / 100.0 - 2.0))) >= 0.5).alias("pred"),
    )
    cells = e.agg(
        F.sum(F.when(F.col("pred") & F.col("label"), 1).otherwise(0))
        .cast("long")
        .alias("tp"),
        F.sum(F.when(F.col("pred") & ~F.col("label"), 1).otherwise(0))
        .cast("long")
        .alias("fp"),
        F.sum(F.when(~F.col("pred") & F.col("label"), 1).otherwise(0))
        .cast("long")
        .alias("fn"),
        F.sum(F.when(~F.col("pred") & ~F.col("label"), 1).otherwise(0))
        .cast("long")
        .alias("tn"),
    )
    p_pos = F.col("tp") * 1.0 / (F.col("tp") + F.col("fp"))
    r_pos = F.col("tp") * 1.0 / (F.col("tp") + F.col("fn"))
    p_neg = F.col("tn") * 1.0 / (F.col("tn") + F.col("fn"))
    r_neg = F.col("tn") * 1.0 / (F.col("tn") + F.col("fp"))
    f1p = 2 * p_pos * r_pos / (p_pos + r_pos)
    f1n = 2 * p_neg * r_neg / (p_neg + r_neg)
    return cells.select(
        "tp",
        "fp",
        "fn",
        "tn",
        F.round(f1p, 6).alias("f1_pos"),
        F.round(f1n, 6).alias("f1_neg"),
        F.round((f1p + f1n) / 2, 6).alias("macro_f1"),
        F.round(
            (F.col("tp") + F.col("tn"))
            * 1.0
            / (F.col("tp") + F.col("fp") + F.col("fn") + F.col("tn")),
            6,
        ).alias("accuracy"),
    )


@query(
    "eval_expected_calibration_error",
    oracle="""
    WITH scored AS (
        SELECT (CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS y,
               ROUND(1.0 / (1.0 + EXP(-(value / 100.0 - 2.0))), 9) AS p
        FROM events),
    bins AS (
        SELECT LEAST(CAST(FLOOR(p * 20) AS BIGINT), 19) AS bin_id,
               COUNT(*) AS n,
               AVG(p) AS conf,
               AVG(y * 1.0) AS acc
        FROM scored GROUP BY 1),
    tot AS (SELECT CAST(SUM(n) AS BIGINT) AS nt FROM bins)
    SELECT t.nt AS n_total,
           CAST(COUNT(*) AS BIGINT) AS n_bins,
           ROUND(SUM(b.n * ABS(b.acc - b.conf)) / t.nt, 6) AS ece,
           ROUND(MAX(ABS(b.acc - b.conf)), 6) AS mce
    FROM bins b, tot t
    GROUP BY t.nt
    """,
)
def eval_expected_calibration_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expected Calibration Error (20 bins) + Maximum Calibration Error
    — the single-number calibration summary distilled from the
    reliability diagram (logreg_calibration_bins): bin the scores,
    weight each bin's |observed - predicted| gap by its mass. One
    binned aggregate + a 1-row rollup; scan-linear."""
    e = table(spark, sf_dir, "events").select(
        (F.col("event_type") == "purchase").cast("int").alias("y"),
        F.round(1.0 / (1.0 + F.exp(-(F.col("value") / 100.0 - 2.0))), 9).alias("p"),
    )
    bins = e.groupBy(
        F.least(F.floor(F.col("p") * 20), F.lit(19)).cast("long").alias("bin_id")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("p").alias("conf"),
        F.avg(F.col("y") * 1.0).alias("acc"),
    )
    tot = bins.agg(F.sum("n").cast("long").alias("nt"))
    gap = F.abs(F.col("acc") - F.col("conf"))
    return (
        bins.crossJoin(F.broadcast(tot))
        .groupBy("nt")
        .agg(
            F.count(F.lit(1)).alias("n_bins"),
            F.round(F.sum(F.col("n") * gap) / F.col("nt"), 6).alias("ece"),
            F.round(F.max(gap), 6).alias("mce"),
        )
        .select(
            F.col("nt").alias("n_total"),
            F.col("n_bins").cast("long").alias("n_bins"),
            "ece",
            "mce",
        )
    )


@query(
    "eval_best_f1_threshold",
    oracle="""
    WITH scored AS (
        SELECT (CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS y,
               ROUND(1.0 / (1.0 + EXP(-(value / 100.0 - 2.0))), 9) AS p
        FROM events),
    hist AS (
        SELECT LEAST(CAST(FLOOR(p * 20) AS BIGINT), 19) AS b,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(y) AS BIGINT) AS pos
        FROM scored GROUP BY 1),
    tot AS (SELECT CAST(SUM(pos) AS BIGINT) AS all_pos FROM hist),
    sweep AS (
        SELECT b AS thr_bin,
               SUM(pos) OVER (ORDER BY b DESC) AS tp,
               SUM(n - pos) OVER (ORDER BY b DESC) AS fp,
               t.all_pos
        FROM hist, tot t),
    f1s AS (
        SELECT thr_bin, tp, fp,
               2.0 * tp / (tp + fp + all_pos) AS f1
        FROM sweep WHERE tp > 0)
    SELECT thr_bin,
           ROUND(thr_bin / 20.0, 2) AS threshold,
           CAST(tp AS BIGINT) AS tp,
           CAST(fp AS BIGINT) AS fp,
           ROUND(f1, 6) AS best_f1
    FROM f1s
    ORDER BY f1 DESC, thr_bin DESC LIMIT 1
    """,
)
def eval_best_f1_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Operating-point selection: the decision threshold (of the 20
    histogram bins) that maximizes F1 — the deployment step after the
    curve diagnostics, computed from the SAME single-pass score
    histogram as eval_pr_curve_points (using F1 = 2TP/(TP+FP+P), which
    avoids dividing precision and recall separately). One histogram
    aggregate + a 20-row reverse-cumulative sweep + an argmax; no
    per-threshold rescans."""
    e = table(spark, sf_dir, "events").select(
        (F.col("event_type") == "purchase").cast("int").alias("y"),
        F.round(1.0 / (1.0 + F.exp(-(F.col("value") / 100.0 - 2.0))), 9).alias("p"),
    )
    hist = e.groupBy(
        F.least(F.floor(F.col("p") * 20), F.lit(19)).cast("long").alias("b")
    ).agg(
        F.count(F.lit(1)).alias("n"), F.sum("y").cast("long").alias("pos")
    )
    tot = hist.agg(F.sum("pos").cast("long").alias("all_pos"))
    w = Window.orderBy(F.col("b").desc()).rowsBetween(Window.unboundedPreceding, 0)
    sweep = hist.crossJoin(F.broadcast(tot)).select(
        F.col("b").alias("thr_bin"),
        F.sum("pos").over(w).alias("tp"),
        F.sum(F.col("n") - F.col("pos")).over(w).alias("fp"),
        "all_pos",
    )
    f1 = 2.0 * F.col("tp") / (F.col("tp") + F.col("fp") + F.col("all_pos"))
    return (
        sweep.filter(F.col("tp") > 0)
        .select(
            "thr_bin",
            F.round(F.col("thr_bin") / 20.0, 2).alias("threshold"),
            F.col("tp").cast("long").alias("tp"),
            F.col("fp").cast("long").alias("fp"),
            F.round(f1, 6).alias("best_f1"),
            f1.alias("_f1_raw"),
        )
        .orderBy(F.col("_f1_raw").desc(), F.col("thr_bin").desc())
        .limit(1)
        .drop("_f1_raw")
    )


@query(
    "eval_interrater_agreement",
    oracle="""
    WITH votes AS (
        SELECT doc_id,
               (CASE WHEN LENGTH(text) >= 200 THEN 1 ELSE 0 END
                + CASE WHEN LENGTH(regexp_replace(text, '[^0-9]', '', 'g'))
                            * 1.0 / LENGTH(text) < 0.2 THEN 1 ELSE 0 END
                + CASE WHEN len(list_distinct(string_split(text, ' ')))
                            * 1.0 / len(string_split(text, ' ')) > 0.3
                       THEN 1 ELSE 0 END) AS a
        FROM documents),
    s AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(a) AS BIGINT) AS tot1,
               CAST(SUM(a * (3 - a)) AS BIGINT) AS dis,
               CAST(SUM(a * a + (3 - a) * (3 - a)) AS BIGINT) AS sq
        FROM votes)
    SELECT n AS n_units,
           ROUND(1.0 - (dis * 1.0 / (3 * n))
                 / (2.0 * tot1 * (3 * n - tot1)
                    / (3.0 * n * (3 * n - 1))), 6) AS krippendorff_alpha,
           ROUND(((sq - 3.0 * n) / (6.0 * n)
                  - (POWER(tot1 * 1.0 / (3 * n), 2)
                     + POWER(1 - tot1 * 1.0 / (3 * n), 2)))
                 / (1 - (POWER(tot1 * 1.0 / (3 * n), 2)
                         + POWER(1 - tot1 * 1.0 / (3 * n), 2))), 6)
               AS fleiss_kappa,
           ROUND((sq - 3.0 * n) / (6.0 * n), 6) AS mean_pairwise_agreement
    FROM s
    """,
)
def eval_interrater_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-annotator agreement between three heuristic quality
    'raters' (length >= 200 chars; digit ratio < 0.2; distinct-token
    ratio > 0.3 — each voting keep/drop per document): Krippendorff's
    alpha (binary, no missing data) and Fleiss' kappa from the SAME
    per-unit vote counts — the agreement audit run before trusting an
    ensemble of cheap filters (or LLM judges) as a training-data gate.
    Chance-corrected agreement is the difference between the two
    headline numbers and raw percent agreement, which is why percent
    agreement alone overstates ensemble reliability.

    With binary votes everything reduces to ONE aggregate over per-doc
    1-vote counts a: disagreeing pairs = a(3-a), agreement pairs from
    a^2+(3-a)^2, marginals from total 1s — integer sums, closed-form
    alpha/kappa, zero joins. Map-side heuristics, one reduce."""
    txt = F.col("text")
    toks = F.split(txt, " ")
    digit_ratio = (
        F.length(F.regexp_replace(txt, "[^0-9]", "")) * F.lit(1.0) / F.length(txt)
    )
    distinct_ratio = F.size(F.array_distinct(toks)) * F.lit(1.0) / F.size(toks)
    a = (
        F.when(F.length(txt) >= 200, 1).otherwise(0)
        + F.when(digit_ratio < 0.2, 1).otherwise(0)
        + F.when(distinct_ratio > 0.3, 1).otherwise(0)
    )
    s = (
        table(spark, sf_dir, "documents")
        .select(a.alias("a"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("a").cast("bigint").alias("tot1"),
            F.sum(F.col("a") * (3 - F.col("a"))).cast("bigint").alias("dis"),
            F.sum(F.col("a") * F.col("a") + (3 - F.col("a")) * (3 - F.col("a")))
            .cast("bigint")
            .alias("sq"),
        )
    )
    n, tot1, dis, sq = F.col("n"), F.col("tot1"), F.col("dis"), F.col("sq")
    de = 2.0 * tot1 * (3 * n - tot1) / (3.0 * n * (3 * n - 1))
    pbar = (sq - 3.0 * n) / (6.0 * n)
    pe = F.pow(tot1 * 1.0 / (3 * n), 2) + F.pow(1 - tot1 * 1.0 / (3 * n), 2)
    return s.select(
        n.alias("n_units"),
        F.round(1.0 - (dis * 1.0 / (3 * n)) / de, 6).alias("krippendorff_alpha"),
        F.round((pbar - pe) / (1 - pe), 6).alias("fleiss_kappa"),
        F.round(pbar, 6).alias("mean_pairwise_agreement"),
    )


# --- pass@k (unbiased estimator) ---------------------------------------------

_PASS_KS = (1, 5, 10)
_PASS_MIN_N = 10  # evaluate every k on the same task set (n >= max k)


def _pass_at_k_sql(k: int) -> str:
    # telescoped product of per-term ratios, multiplied left-to-right in
    # DOUBLE — the identical IEEE expression tree the Spark side builds,
    # so both engines produce bit-equal values (raw integer products
    # overflow INT64 at k=10 with per-task n in the hundreds)
    prod = " * ".join(f"((n - c - {i}) * 1.0 / (n - {i}))" for i in range(k))
    return f"CASE WHEN n - c < {k} THEN 1.0 ELSE 1.0 - {prod} END"


@query(
    "eval_pass_at_k",
    oracle=f"""
    WITH per_task AS (
        SELECT user_id AS task_id,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                    AS BIGINT) AS c
        FROM events GROUP BY user_id),
    eligible AS (SELECT * FROM per_task WHERE n >= {_PASS_MIN_N}),
    scored AS (
        SELECT n, c,
               {_pass_at_k_sql(1)} AS p1,
               {_pass_at_k_sql(5)} AS p5,
               {_pass_at_k_sql(10)} AS p10
        FROM eligible)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_tasks,
           ROUND(AVG(p1), 6) AS pass_at_1,
           ROUND(AVG(p5), 6) AS pass_at_5,
           ROUND(AVG(p10), 6) AS pass_at_10
    FROM scored
    """,
)
def eval_pass_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unbiased pass@k (Chen et al. 2021, the Codex estimator): for a
    task with n samples of which c are correct, pass@k = 1 -
    C(n-c,k)/C(n,k) — the probability that a uniformly drawn size-k
    subset contains at least one correct sample. Computed as the
    telescoped product 1 - prod_{{i<k}} (n-c-i)/(n-i) in EXACT integer
    arithmetic (n here is bounded by per-task sample counts, so the
    5-term products stay far inside BIGINT), never the naive 1-(1-c/n)^k
    that overestimates.

    Harness mapping: each user is a task, each event a sample,
    purchases are passes; tasks with fewer than {_PASS_MIN_N} samples
    are dropped so every k is measured on the same task set. Plan: one
    partial-aggregated groupBy over the fact table, then per-row
    arithmetic and a scalar summary — the 100 TB cost is the single
    keyed count."""
    e = table(spark, sf_dir, "events")
    per_task = e.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum((F.col("event_type") == "purchase").cast("int"))
        .cast("bigint")
        .alias("c"),
    )
    eligible = per_task.filter(F.col("n") >= _PASS_MIN_N)

    def pass_at_k(k: int):
        prod = (F.col("n") - F.col("c")) * 1.0 / F.col("n")
        for i in range(1, k):
            prod = prod * ((F.col("n") - F.col("c") - i) * 1.0 / (F.col("n") - i))
        return F.when(F.col("n") - F.col("c") < k, F.lit(1.0)).otherwise(1.0 - prod)

    scored = eligible.select(
        pass_at_k(1).alias("p1"), pass_at_k(5).alias("p5"), pass_at_k(10).alias("p10")
    )
    return scored.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tasks"),
        F.round(F.avg("p1"), 6).alias("pass_at_1"),
        F.round(F.avg("p5"), 6).alias("pass_at_5"),
        F.round(F.avg("p10"), 6).alias("pass_at_10"),
    )


# --- rank-biased overlap (RBO) -----------------------------------------------

_RBO_P = 0.9


@query(
    "eval_rank_biased_overlap",
    oracle=f"""
    WITH q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qe
               FROM embeddings WHERE vec_id < {{nq}}),
    c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
          FROM embeddings WHERE vec_id >= {{nq}}),
    full_rank AS (
        SELECT q.qid, c.vec_id,
               ROW_NUMBER() OVER (
                   PARTITION BY q.qid
                   ORDER BY ROUND(list_cosine_similarity(c.e, q.qe), 6) DESC,
                            c.vec_id) AS ra
        FROM c, q),
    trunc_rank AS (
        SELECT q.qid, c.vec_id,
               ROW_NUMBER() OVER (
                   PARTITION BY q.qid
                   ORDER BY ROUND(list_cosine_similarity(
                                c.e[1:{{sub}}], q.qe[1:{{sub}}]), 6) DESC,
                            c.vec_id) AS rb
        FROM c, q),
    m AS (
        SELECT f.qid, GREATEST(f.ra, t.rb) AS m
        FROM (SELECT qid, vec_id, ra FROM full_rank WHERE ra <= {{k}}) f
        JOIN (SELECT qid, vec_id, rb FROM trunc_rank WHERE rb <= {{k}}) t
          ON t.qid = f.qid AND t.vec_id = f.vec_id),
    depths AS (SELECT unnest(generate_series(1, {{k}})) AS d),
    grid AS (SELECT qq.qid, dp.d
             FROM (SELECT DISTINCT qid FROM m) qq CROSS JOIN depths dp),
    xd AS (
        SELECT g.qid, g.d,
               CAST(SUM(CASE WHEN m.m <= g.d THEN 1 ELSE 0 END) AS DOUBLE) AS x
        FROM grid g LEFT JOIN m ON m.qid = g.qid
        GROUP BY g.qid, g.d)
    SELECT qid,
           ROUND((1 - {_RBO_P}) * SUM(POW({_RBO_P}, d - 1) * x / d), 6)
               AS rbo_at_{{k}}
    FROM xd
    GROUP BY qid
    ORDER BY qid
    """.format(nq=N_QUERIES, sub=_MRL_SUBDIM, k=K),
)
def eval_rank_biased_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-biased overlap (Webber et al. 2010), truncated at depth
    {K}: RBO = (1-p) * sum_d p^(d-1) * X_d / d where X_d is the overlap
    of the two rankings' top-d prefixes — the TOP-WEIGHTED ranking
    similarity that Kendall/Spearman (which weight all positions
    equally) can't give, and the standard way to quantify how much a
    cheaper index (here: Matryoshka-truncated cosine) disturbs what
    users actually see. X_d never needs per-depth rescans: an item in
    both top-{K}s enters every prefix from depth m = max(ra, rb), so
    X_d = #{{m <= d}} — one tiny depth-grid join over Q x {K} rows.

    Same broadcast-query / corpus-scan ranking topology as the other
    retrieval evals; ranks order by (rounded cosine, vec_id) so both
    engines rank identical keys."""
    emb = table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").cast("array<double>").alias("qe"),
    )
    c = emb.filter(F.col("vec_id") >= N_QUERIES).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )

    def ranked(sub: int | None, name: str):
        e_col = F.col("e") if sub is None else F.slice("e", 1, sub)
        qe_col = F.col("qe") if sub is None else F.slice("qe", 1, sub)
        cos = F.round(dot(e_col, qe_col) / (l2_norm(e_col) * l2_norm(qe_col)), 6)
        w = Window.partitionBy("qid").orderBy(cos.desc(), F.col("vec_id"))
        return (
            c.crossJoin(F.broadcast(q))
            .withColumn(name, F.row_number().over(w))
            .filter(F.col(name) <= K)
            .select("qid", "vec_id", name)
        )

    m = (
        ranked(None, "ra")
        .join(ranked(_MRL_SUBDIM, "rb"), ["qid", "vec_id"])
        .select("qid", F.greatest("ra", "rb").alias("m"))
    )
    depths = spark.range(1, K + 1).select(F.col("id").cast("int").alias("d"))
    qids = m.select("qid").distinct()
    grid = qids.crossJoin(F.broadcast(depths))
    xd = (
        grid.join(m, "qid", "left")
        .groupBy("qid", "d")
        .agg(
            F.sum(F.when(F.col("m") <= F.col("d"), 1).otherwise(0))
            .cast("double")
            .alias("x")
        )
    )
    return (
        xd.groupBy("qid")
        .agg(
            F.round(
                (1 - _RBO_P)
                * F.sum(F.pow(F.lit(_RBO_P), F.col("d") - 1) * F.col("x") / F.col("d")),
                6,
            ).alias(f"rbo_at_{K}")
        )
        .orderBy("qid")
    )


# --- corpus BLEU-2 -------------------------------------------------------------


@query(
    "eval_bleu2_corpus",
    oracle="""
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    ids AS (SELECT doc_id FROM documents),
    prs AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM ids a JOIN ids b ON b.doc_id = a.doc_id + 1
        WHERE a.doc_id % 2 = 0),
    ng AS (
        SELECT doc_id, 1 AS n, w[i] AS g, CAST(COUNT(*) AS BIGINT) AS c
        FROM w, unnest(generate_series(1, len(w))) AS t(i)
        GROUP BY doc_id, g
        UNION ALL
        SELECT doc_id, 2 AS n, array_to_string(w[i:i+1], ' ') AS g,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM w, unnest(generate_series(1, len(w) - 1)) AS t(i)
        GROUP BY doc_id, g),
    num AS (
        SELECT a.n, SUM(LEAST(a.c, b.c)) AS clipped
        FROM ng a
        JOIN prs p ON p.doc_a = a.doc_id
        JOIN ng b ON b.doc_id = p.doc_b AND b.n = a.n AND b.g = a.g
        GROUP BY a.n),
    den AS (
        SELECT n.n, SUM(n.c) AS total
        FROM ng n JOIN prs p ON p.doc_a = n.doc_id
        GROUP BY n.n),
    rlen AS (
        SELECT SUM(n.c) AS len_r
        FROM ng n JOIN prs p ON p.doc_b = n.doc_id WHERE n.n = 1),
    flat AS (
        SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM prs) AS n_pairs,
               (SELECT clipped FROM num WHERE n = 1) * 1.0
                   / (SELECT total FROM den WHERE n = 1) AS p1,
               (SELECT clipped FROM num WHERE n = 2) * 1.0
                   / (SELECT total FROM den WHERE n = 2) AS p2,
               (SELECT total FROM den WHERE n = 1) AS len_c,
               (SELECT len_r FROM rlen) AS len_r)
    SELECT n_pairs, ROUND(p1, 6) AS p1, ROUND(p2, 6) AS p2,
           ROUND(CASE WHEN len_c > len_r THEN 1.0
                      ELSE EXP(1.0 - len_r * 1.0 / len_c) END, 6) AS brevity_penalty,
           ROUND(CASE WHEN p1 = 0 OR p2 = 0 THEN 0.0
                      ELSE CASE WHEN len_c > len_r THEN 1.0
                                ELSE EXP(1.0 - len_r * 1.0 / len_c) END
                           * EXP(0.5 * (LN(p1) + LN(p2))) END, 6) AS bleu2
    FROM flat
    """,
)
def eval_bleu2_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level BLEU-2 (Papineni et al. 2002) between fixed
    candidate/reference document pairs (even doc_id against its
    successor, the same pairing as eval_rouge2_pairs): CLIPPED modified
    n-gram precision pooled over the whole corpus for n=1,2, corpus
    brevity penalty, geometric mean. Corpus pooling (sum numerators
    and denominators BEFORE dividing) is what distinguishes BLEU from
    a mean of per-pair scores — and is also what makes it one
    aggregation tree instead of a per-pair reduce.

    Plan: one n-gram multiset aggregate per document (unigrams and
    bigrams unioned with an `n` tag so ONE join handles both orders);
    the clipped-overlap join is keyed (pair, n, gram) — pairing by key
    arithmetic, no similarity search; precisions, lengths and BP are a
    handful of 2-row reduces. All counts integers; divisions happen
    once at the end."""
    d = table(spark, sf_dir, "documents").select("doc_id", tokens("text").alias("w"))
    ids = d.select("doc_id")
    prs = (
        ids.filter(F.col("doc_id") % 2 == 0)
        .select(F.col("doc_id").alias("doc_a"))
        .join(
            ids.select((F.col("doc_id") - 1).alias("doc_a"), F.col("doc_id").alias("doc_b")),
            "doc_a",
        )
    )
    uni = d.select("doc_id", F.lit(1).alias("n"), F.explode("w").alias("g"))
    big = d.select(
        "doc_id", F.lit(2).alias("n"), F.explode(shingles(F.col("w"), 2)).alias("g")
    )
    ng = (
        uni.unionByName(big)
        .groupBy("doc_id", "n", "g")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    a = ng.join(prs, ng.doc_id == prs.doc_a).select(
        "doc_a", "doc_b", "n", "g", F.col("c").alias("ca")
    )
    b = ng.select(F.col("doc_id").alias("doc_b"), "n", "g", F.col("c").alias("cb"))
    num = (
        a.join(b, ["doc_b", "n", "g"])
        .groupBy("n")
        .agg(F.sum(F.least("ca", "cb")).alias("clipped"))
    )
    den = (
        ng.join(prs, ng.doc_id == prs.doc_a)
        .groupBy("n")
        .agg(F.sum("c").alias("total"))
    )
    rlen = (
        ng.filter(F.col("n") == 1)
        .join(prs, ng.doc_id == prs.doc_b)
        .agg(F.sum("c").alias("len_r"))
    )
    npairs = prs.agg(F.count(F.lit(1)).cast("bigint").alias("n_pairs"))
    nd = num.join(den, "n").select(
        "n", (F.col("clipped") * 1.0 / F.col("total")).alias("p"), "total"
    )
    flat = (
        npairs.crossJoin(
            F.broadcast(nd.filter(F.col("n") == 1).select(
                F.col("p").alias("p1"), F.col("total").alias("len_c")
            ))
        )
        .crossJoin(F.broadcast(nd.filter(F.col("n") == 2).select(F.col("p").alias("p2"))))
        .crossJoin(F.broadcast(rlen))
    )
    bp = F.when(F.col("len_c") > F.col("len_r"), F.lit(1.0)).otherwise(
        F.exp(1.0 - F.col("len_r") * 1.0 / F.col("len_c"))
    )
    return flat.select(
        "n_pairs",
        F.round("p1", 6).alias("p1"),
        F.round("p2", 6).alias("p2"),
        F.round(bp, 6).alias("brevity_penalty"),
        F.round(
            F.when((F.col("p1") == 0) | (F.col("p2") == 0), F.lit(0.0)).otherwise(
                bp * F.exp(0.5 * (F.log("p1") + F.log("p2")))
            ),
            6,
        ).alias("bleu2"),
    )


# --- chrF2 ----------------------------------------------------------------------


@query(
    "eval_chrf2_pairs",
    oracle="""
    WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents),
    cb AS (
        SELECT doc_id, substr(t, i, 2) AS g, CAST(COUNT(*) AS BIGINT) AS c
        FROM toks, unnest(generate_series(1, len(t) - 1)) AS u(i)
        WHERE len(t) >= 2
        GROUP BY doc_id, g),
    tot AS (SELECT doc_id, SUM(c) AS t FROM cb GROUP BY doc_id),
    ov AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               SUM(LEAST(a.c, b.c)) AS o
        FROM cb a JOIN cb b ON b.doc_id = a.doc_id + 1 AND b.g = a.g
        WHERE a.doc_id % 2 = 0
        GROUP BY 1, 2),
    scored AS (
        SELECT ov.doc_a, ov.doc_b, CAST(ov.o AS BIGINT) AS overlap_chars,
               ov.o * 1.0 / ta.t AS p, ov.o * 1.0 / tb.t AS r
        FROM ov
        JOIN tot ta ON ta.doc_id = ov.doc_a
        JOIN tot tb ON tb.doc_id = ov.doc_b)
    SELECT doc_a, doc_b, overlap_chars,
           ROUND(p, 6) AS chrf_p, ROUND(r, 6) AS chrf_r,
           ROUND(5.0 * p * r / (4.0 * p + r), 6) AS chrf2
    FROM scored
    ORDER BY ROUND(5.0 * p * r / (4.0 * p + r), 6) DESC, doc_a
    LIMIT 20
    """,
)
def eval_chrf2_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """chrF2 (Popovic 2015) between the fixed candidate/reference pairs
    (even doc_id vs successor, the rouge2/BLEU pairing): CLIPPED
    character-bigram precision/recall with recall weighted beta=2 —
    chrF2 = 5PR/(4P+R). Character n-grams are computed WITHIN words
    (whitespace never crosses a gram, the chrF convention), which makes
    the metric robust to tokenization differences the word-level
    metrics (BLEU/ROUGE) are blind to — the reason chrF is the machine
    translation eval of choice for morphologically rich languages.

    Plan: tokens explode once, char bigrams are a projected-column HOF
    slice per token (linear in corpus chars), one multiset aggregate
    per doc, and the overlap is the (pair, gram)-keyed equi-join —
    pairing by key arithmetic, no similarity search. Counts are
    integers; P/R/F divide once at the end."""
    d = table(spark, sf_dir, "documents").select("doc_id", tokens("text").alias("w"))
    tok = d.select("doc_id", F.explode("w").alias("t")).filter(F.length("t") >= 2)
    cb = (
        tok.select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.length("t") - 1),
                    lambda i: F.col("t").substr(i, F.lit(2)),
                )
            ).alias("g"),
        )
        .groupBy("doc_id", "g")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    tot = cb.groupBy("doc_id").agg(F.sum("c").alias("t"))
    a = cb.filter(F.col("doc_id") % 2 == 0).select(
        F.col("doc_id").alias("doc_a"), "g", F.col("c").alias("ca")
    )
    b = cb.filter(F.col("doc_id") % 2 == 1).select(
        (F.col("doc_id") - 1).alias("doc_a"),
        F.col("doc_id").alias("doc_b"),
        "g",
        F.col("c").alias("cb"),
    )
    ov = (
        a.join(b, ["doc_a", "g"])
        .groupBy("doc_a", "doc_b")
        .agg(F.sum(F.least("ca", "cb")).alias("o"))
    )
    ta = tot.select(F.col("doc_id").alias("doc_a"), F.col("t").alias("ta"))
    tb = tot.select(F.col("doc_id").alias("doc_b"), F.col("t").alias("tb"))
    p = F.col("o") * 1.0 / F.col("ta")
    r = F.col("o") * 1.0 / F.col("tb")
    chrf2 = 5.0 * p * r / (4.0 * p + r)
    return (
        ov.join(ta, "doc_a")
        .join(tb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.col("o").cast("bigint").alias("overlap_chars"),
            F.round(p, 6).alias("chrf_p"),
            F.round(r, 6).alias("chrf_r"),
            F.round(chrf2, 6).alias("chrf2"),
        )
        .orderBy(F.col("chrf2").desc(), "doc_a")
        .limit(20)
    )


# --- character error rate --------------------------------------------------------


_CER_WINDOW = 1500  # per-pair DP bound: ~2.25M cells worst case


@query(
    "eval_cer_pairs",
    oracle=f"""
    WITH prs AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               substr(a.text, 1, {_CER_WINDOW}) AS ta,
               substr(b.text, 1, {_CER_WINDOW}) AS tb,
               LEAST(b.n_chars, {_CER_WINDOW}) AS len_ref
        FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
        WHERE a.doc_id % 2 = 0)
    SELECT doc_a, doc_b,
           CAST(levenshtein(ta, tb) AS BIGINT) AS edit_distance,
           CAST(len_ref AS BIGINT) AS len_ref,
           ROUND(levenshtein(ta, tb) * 1.0 / len_ref, 6) AS cer
    FROM prs
    ORDER BY ROUND(levenshtein(ta, tb) * 1.0 / len_ref, 6) ASC, doc_a
    LIMIT 20
    """,
)
def eval_cer_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character error rate between the fixed candidate/reference pairs
    (even doc_id vs successor): CER = levenshtein(cand, ref)/|ref|, the
    ASR/OCR-style eval that completes the pair-metric family (BLEU and
    ROUGE count n-gram overlap, chrF counts char n-grams, CER measures
    ALIGNED edit cost — the only one of the four that penalizes order).
    Surfaces the 20 closest pairs.

    Scale note, stated honestly: exact Levenshtein is O(|a|*|b|) PER
    PAIR, so the DP runs on a fixed prefix WINDOW (first 1500 chars —
    never binding on this corpus, whose docs max out under 600 chars;
    on a long-document lake it bounds the per-pair cost at ~2.25M DP
    cells, where the CER estimate has long converged). Pairing is 1:1
    by key arithmetic — cost is linear in pair count, embarrassingly
    parallel, no shuffle beyond the pair join. For unpaired corpora use
    the banded/blocked forms (fuzzy_join_blocked_levenshtein,
    linkage_symspell_edit1) — never exact DP across a cross-product."""
    d = table(spark, sf_dir, "documents").select("doc_id", "text", "n_chars")
    a = d.filter(F.col("doc_id") % 2 == 0).select(
        F.col("doc_id").alias("doc_a"),
        F.substring("text", 1, _CER_WINDOW).alias("ta"),
    )
    b = d.select(
        (F.col("doc_id") - 1).alias("doc_a"),
        F.col("doc_id").alias("doc_b"),
        F.substring("text", 1, _CER_WINDOW).alias("tb"),
        F.least("n_chars", F.lit(_CER_WINDOW)).alias("len_ref"),
    )
    ed = F.levenshtein("ta", "tb")
    return (
        a.join(b, "doc_a")
        .select(
            "doc_a",
            "doc_b",
            ed.cast("bigint").alias("edit_distance"),
            F.col("len_ref").cast("bigint").alias("len_ref"),
            F.round(ed * 1.0 / F.col("len_ref"), 6).alias("cer"),
        )
        .orderBy(F.col("cer").asc(), "doc_a")
        .limit(20)
    )
