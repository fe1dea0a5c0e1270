"""Lexical retrieval: BM25 scoring over the documents corpus.

The standard first-stage ranker for search and for RAG-style training
data selection. Everything is relational — no inverted-index service,
no UDFs:

- tokenize once (``split`` + ``explode``, map-side);
- per-(doc, term) TF and per-doc length from the same intermediate;
- document frequencies for the query terms only (a handful of rows →
  broadcast);
- the corpus constants (N, avgdl) are one global aggregate row,
  cross-join-broadcast into the scoring expression.

At 100 TB the only shuffle is the (doc_id, token) TF aggregate, which
rides the tokenizer's natural partitioning; the query-term DF table and
the scalar constants stay KB-sized regardless of corpus size. The
final top-k is a ``TakeOrderedAndProject`` (per-partition heaps, no
global sort).

The reference has no retrieval surface (it stops at bronze ingest,
/root/reference/README.md:58-72); this is north-star extension work.
Okapi BM25 with the standard k1=1.2, b=0.75 and the Robertson-
Sparck Jones idf with +1 smoothing (Lucene's formulation, always
positive).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table
from ..functions.vector import dot, l2_norm
from ..registry import query

_TERMS = ("table", "spark", "hash")
_K1 = 1.2
_B = 0.75


@query(
    "text_bm25_topk",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS token
        FROM documents),
    dl AS (SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY doc_id),
    consts AS (
        SELECT CAST(COUNT(*) AS DOUBLE) AS n, AVG(CAST(dl AS DOUBLE)) AS avgdl
        FROM dl),
    tf AS (
        SELECT doc_id, token, CAST(COUNT(*) AS DOUBLE) AS tf
        FROM tok
        WHERE token IN {_TERMS!r}
        GROUP BY doc_id, token),
    df AS (
        SELECT token, CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS df
        FROM tf GROUP BY token),
    scored AS (
        SELECT t.doc_id,
               SUM(
                   LN((c.n - d.df + 0.5) / (d.df + 0.5) + 1.0)
                   * t.tf * ({_K1} + 1.0)
                   / (t.tf + {_K1} * (1.0 - {_B} + {_B} * l.dl / c.avgdl))
               ) AS score
        FROM tf t
        JOIN df d USING (token)
        JOIN dl l USING (doc_id)
        CROSS JOIN consts c
        GROUP BY t.doc_id)
    SELECT doc_id, ROUND(score, 6) AS bm25
    FROM scored
    ORDER BY bm25 DESC, doc_id ASC
    LIMIT 20
    """,
)
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 documents by BM25 for a fixed conjunctive query — ONE
    corpus scan, zero joins.

    Because the query terms are known up front, per-term TF becomes
    conditional aggregation inside the same (doc_id) hash agg that
    computes document length — so the corpus is tokenized and reduced
    exactly once. The corpus constants (N, avgdl, per-term DF) are one
    further global aggregate over that per-doc frame, whose input
    exchange Catalyst dedups via ReusedExchange; the single constants
    row then rides a broadcast cross join into the scoring projection,
    and the top-k is a TakeOrderedAndProject. Adding terms widens the
    aggregate by two columns per term — the scan count stays 1."""
    return (
        _bm25_scored(spark, sf_dir)
        .orderBy(F.col("bm25").desc(), F.col("doc_id").asc())
        .limit(20)
    )


def _bm25_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, bm25) for every document matching ≥1 query term — the
    one-scan conditional-aggregation plan described in text_bm25_topk."""
    d = table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("token"))
    per_doc = tok.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("double").alias("dl"),
        *[
            F.sum((F.col("token") == t).cast("double")).alias(f"tf_{i}")
            for i, t in enumerate(_TERMS)
        ],
    )
    consts = per_doc.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.avg("dl").alias("avgdl"),
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("double")).alias(f"df_{i}")
            for i in range(len(_TERMS))
        ],
    )
    contribs = []
    for i in range(len(_TERMS)):
        tf, df = F.col(f"tf_{i}"), F.col(f"df_{i}")
        idf = F.log((F.col("n") - df + 0.5) / (df + 0.5) + 1.0)
        denom = tf + _K1 * (1.0 - _B + _B * F.col("dl") / F.col("avgdl"))
        contribs.append(idf * tf * (_K1 + 1.0) / denom)
    score = sum(contribs[1:], contribs[0])
    return (
        per_doc.crossJoin(F.broadcast(consts))
        .filter(sum([F.col(f"tf_{i}") for i in range(1, len(_TERMS))], F.col("tf_0")) > 0)
        .select("doc_id", F.round(score, 6).alias("bm25"))
    )


# --- Dirichlet-smoothed query likelihood -------------------------------------

_QL_MU = 100.0


@query(
    "retrieval_dirichlet_ql",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS token
        FROM documents),
    dl AS (SELECT doc_id, CAST(COUNT(*) AS DOUBLE) AS dl FROM tok GROUP BY doc_id),
    coll AS (
        SELECT CAST(COUNT(*) AS DOUBLE) AS clen FROM tok),
    cf AS (
        SELECT token, CAST(COUNT(*) AS DOUBLE) AS cf FROM tok
        WHERE token IN {_TERMS!r} GROUP BY token),
    tf AS (
        SELECT doc_id, token, CAST(COUNT(*) AS DOUBLE) AS tf
        FROM tok WHERE token IN {_TERMS!r} GROUP BY doc_id, token),
    scored AS (
        SELECT d.doc_id,
               ROUND(SUM(LN((COALESCE(t.tf, 0) + {_QL_MU} * c.cf / co.clen)
                            / (d.dl + {_QL_MU}))), 6) AS ql,
               SUM(COALESCE(t.tf, 0)) AS n_hits
        FROM dl d
        CROSS JOIN cf c
        CROSS JOIN coll co
        LEFT JOIN tf t ON t.doc_id = d.doc_id AND t.token = c.token
        GROUP BY d.doc_id, d.dl)
    SELECT doc_id, ql
    FROM scored
    WHERE n_hits > 0
    ORDER BY ql DESC, doc_id ASC
    LIMIT 10
    """,
)
def retrieval_dirichlet_ql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query-likelihood ranking with DIRICHLET smoothing (Zhai &
    Lafferty) — the language-modeling sibling of BM25 and the scorer
    behind Indri/Galago-style engines:

        score(d) = sum_t log( (tf_{{t,d}} + mu * cf_t/|C|) / (|d| + mu) )

    Same one-scan shape as text_bm25_topk: fixed query terms become
    conditional sums inside the per-doc aggregate, collection stats
    (cf_t, |C|) ride a broadcast one-row frame, and TakeOrdered keeps
    the top 10 — the corpus never joins or shuffles on tokens. Docs
    with zero query-term hits are excluded (their score is pure
    background mass and rank-identical)."""
    d = table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("token"))
    per_doc = tok.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("double").alias("dl"),
        *[
            F.sum((F.col("token") == t).cast("double")).alias(f"tf_{i}")
            for i, t in enumerate(_TERMS)
        ],
    )
    consts = tok.agg(
        F.count(F.lit(1)).cast("double").alias("clen"),
        *[
            F.sum((F.col("token") == t).cast("double")).alias(f"cf_{i}")
            for i, t in enumerate(_TERMS)
        ],
    )
    terms = [
        F.log(
            (F.col(f"tf_{i}") + _QL_MU * F.col(f"cf_{i}") / F.col("clen"))
            / (F.col("dl") + _QL_MU)
        )
        for i in range(len(_TERMS))
    ]
    hits = sum([F.col(f"tf_{i}") for i in range(1, len(_TERMS))], F.col("tf_0"))
    return (
        per_doc.crossJoin(F.broadcast(consts))
        .filter(hits > 0)
        .select("doc_id", F.round(sum(terms[1:], terms[0]), 6).alias("ql"))
        .orderBy(F.col("ql").desc(), F.col("doc_id").asc())
        .limit(10)
    )


# --- hybrid retrieval: reciprocal rank fusion --------------------------------

_RRF_K = 60
_RRF_DEPTH = 100
_RRF_TOPN = 15

# same lexical pipeline as text_bm25_topk's oracle, kept through the
# per-doc score so a ranking window can run over it
_BM25_SCORED_CTES = f"""
    WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS token
        FROM documents),
    dl AS (SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY doc_id),
    consts AS (
        SELECT CAST(COUNT(*) AS DOUBLE) AS n, AVG(CAST(dl AS DOUBLE)) AS avgdl
        FROM dl),
    tf AS (
        SELECT doc_id, token, CAST(COUNT(*) AS DOUBLE) AS tf
        FROM tok
        WHERE token IN {_TERMS!r}
        GROUP BY doc_id, token),
    df AS (
        SELECT token, CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS df
        FROM tf GROUP BY token),
    lex_scored AS (
        SELECT t.doc_id,
               ROUND(SUM(
                   LN((c.n - d.df + 0.5) / (d.df + 0.5) + 1.0)
                   * t.tf * ({_K1} + 1.0)
                   / (t.tf + {_K1} * (1.0 - {_B} + {_B} * l.dl / c.avgdl))
               ), 6) AS bm25
        FROM tf t
        JOIN df d USING (token)
        JOIN dl l USING (doc_id)
        CROSS JOIN consts c
        GROUP BY t.doc_id)
"""


@query(
    "hybrid_rrf_fusion",
    oracle=_BM25_SCORED_CTES
    + f"""
    , lex AS (
        SELECT doc_id, ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS r
        FROM lex_scored WHERE doc_id <> 0
        QUALIFY r <= {_RRF_DEPTH}),
    q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0),
    dense AS (
        SELECT e.vec_id AS doc_id,
               ROW_NUMBER() OVER (ORDER BY
                   ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv), 6)
                   DESC, e.vec_id) AS r
        FROM embeddings e, q WHERE e.vec_id <> 0
        QUALIFY r <= {_RRF_DEPTH})
    SELECT COALESCE(l.doc_id, d.doc_id) AS doc_id,
           ROUND(COALESCE(1.0 / ({_RRF_K} + l.r), 0)
                 + COALESCE(1.0 / ({_RRF_K} + d.r), 0), 6) AS rrf_score
    FROM lex l FULL OUTER JOIN dense d ON l.doc_id = d.doc_id
    ORDER BY rrf_score DESC, doc_id
    LIMIT {_RRF_TOPN}
    """,
)
def hybrid_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid search: reciprocal rank fusion of the BM25 lexical list and
    the dense cosine list (the standard RAG first-stage combiner).

    RRF fuses TOP-DEPTH TRUNCATED lists — that is what makes it scale:
    each ranker reduces the corpus to _RRF_DEPTH (doc_id, rank) rows
    (BM25 via the one-scan conditional aggregate, dense via one
    broadcast-query scoring pass), and the fusion itself is a full-outer
    join of two 100-row frames. A document missing from one list
    contributes 0 from that list, per Cormack et al. Ranks order by the
    6-dp-rounded score with doc_id tiebreak in both engines, so fusion
    input is bit-identical. Query = terms {', '.join(_TERMS)} lexically,
    vector 0 densely (its own row excluded from both lists)."""
    lex = (
        _bm25_scored(spark, sf_dir)
        .filter(F.col("doc_id") != 0)
        .withColumn(
            "r",
            F.row_number().over(
                Window.partitionBy().orderBy(F.col("bm25").desc(), F.col("doc_id"))
            ),
        )
        .filter(F.col("r") <= _RRF_DEPTH)
        .select("doc_id", "r")
    )
    emb = table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").cast("array<double>").alias("qv")
    )
    cos = F.round(
        dot("emb", F.col("qv")) / (l2_norm("emb") * l2_norm(F.col("qv"))), 6
    )
    dense = (
        emb.filter(F.col("vec_id") != 0)
        .select(
            F.col("vec_id").alias("doc_id"),
            F.col("embedding").cast("array<double>").alias("emb"),
        )
        .crossJoin(F.broadcast(q))
        .select("doc_id", cos.alias("cosine"))
        .withColumn(
            "r",
            F.row_number().over(
                Window.partitionBy().orderBy(F.col("cosine").desc(), F.col("doc_id"))
            ),
        )
        .filter(F.col("r") <= _RRF_DEPTH)
        .select("doc_id", "r")
    )
    fused = lex.withColumnRenamed("r", "r_lex").join(
        dense.withColumnRenamed("r", "r_dense"), "doc_id", "full_outer"
    )
    rrf = F.round(
        F.coalesce(F.lit(1.0) / (_RRF_K + F.col("r_lex")), F.lit(0.0))
        + F.coalesce(F.lit(1.0) / (_RRF_K + F.col("r_dense")), F.lit(0.0)),
        6,
    )
    return (
        fused.select("doc_id", rrf.alias("rrf_score"))
        .orderBy(F.col("rrf_score").desc(), F.col("doc_id"))
        .limit(_RRF_TOPN)
    )


# --- Kneser-Ney bigram LM -------------------------------------------------

_KN_D = 0.75
_KN_TOPN = 20


@query(
    "lm_kneser_ney_bigrams",
    oracle=f"""
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    bg AS (
        SELECT w[i:i] [1] AS w1, w[i+1:i+1] [1] AS w2,
               CAST(COUNT(*) AS DOUBLE) AS c
        FROM w, unnest(generate_series(1, len(w) - 1)) AS t(i)
        GROUP BY 1, 2),
    uni AS (SELECT w1, SUM(c) AS cw1 FROM bg GROUP BY w1),
    fanout AS (SELECT w1, CAST(COUNT(*) AS DOUBLE) AS n_types FROM bg GROUP BY w1),
    cont AS (SELECT w2, CAST(COUNT(*) AS DOUBLE) AS n_left FROM bg GROUP BY w2),
    totals AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_bigram_types FROM bg),
    pkn AS (
        SELECT b.w1, b.w2, b.c,
               GREATEST(b.c - {_KN_D}, 0) / u.cw1
                 + ({_KN_D} * f.n_types / u.cw1)
                   * (ct.n_left / t.n_bigram_types) AS p
        FROM bg b
        JOIN uni u ON u.w1 = b.w1
        JOIN fanout f ON f.w1 = b.w1
        JOIN cont ct ON ct.w2 = b.w2
        CROSS JOIN totals t)
    SELECT w1, w2, CAST(c AS BIGINT) AS c, ROUND(p, 6) AS p_kn
    FROM pkn
    ORDER BY ROUND(p, 6) DESC, w1, w2
    LIMIT {_KN_TOPN}
    """,
)
def lm_kneser_ney_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser-Ney bigram probabilities (absolute discount
    D=0.75) — the smoothing that makes count-based LMs usable as
    perplexity filters: probability mass freed by discounting observed
    bigrams is redistributed by CONTINUATION frequency ('how many
    distinct left-contexts does w2 follow'), not raw frequency, which
    is what distinguishes KN from the Laplace smoothing in
    `doc_bigram_logprob`. Top-20 highest-probability bigrams reported.

    Plan: one bigram-count aggregate over the corpus, then three
    vocabulary-sized marginals (left counts, left fan-out, continuation
    counts) that join back keyed on w1/w2 — every frame after the first
    aggregate is vocabulary-bounded. Counts are integers in doubles;
    the KN formula evaluates with identical structure on both engines."""
    d = table(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("w")
    )
    count = F.size("w") - 1
    pairs = d.select(
        F.explode(
            F.when(
                count >= 1,
                F.transform(
                    F.sequence(F.lit(1), count),
                    lambda i: F.struct(
                        F.element_at("w", i).alias("w1"),
                        F.element_at("w", i + 1).alias("w2"),
                    ),
                ),
            ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
        ).alias("p")
    ).select("p.w1", "p.w2")
    bg = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).cast("double").alias("c"))
    uni = bg.groupBy("w1").agg(F.sum("c").alias("cw1"))
    fanout = bg.groupBy("w1").agg(F.count(F.lit(1)).cast("double").alias("n_types"))
    cont = bg.groupBy("w2").agg(F.count(F.lit(1)).cast("double").alias("n_left"))
    totals = bg.agg(F.count(F.lit(1)).cast("double").alias("n_bigram_types"))
    p = (
        F.greatest(F.col("c") - _KN_D, F.lit(0.0)) / F.col("cw1")
        + (_KN_D * F.col("n_types") / F.col("cw1"))
        * (F.col("n_left") / F.col("n_bigram_types"))
    )
    return (
        bg.join(uni, "w1")
        .join(fanout, "w1")
        .join(cont, "w2")
        .crossJoin(F.broadcast(totals))
        .select(
            "w1",
            "w2",
            F.col("c").cast("bigint").alias("c"),
            F.round(p, 6).alias("p_kn"),
        )
        .orderBy(F.col("p_kn").desc(), "w1", "w2")
        .limit(_KN_TOPN)
    )


# --- RM3 pseudo-relevance feedback ----------------------------------------

_RM3_FB_DOCS = 10
_RM3_EXP_TERMS = 5


def _rm3_oracle() -> str:
    terms_sql = ", ".join(f"'{t}'" for t in _TERMS)
    return f"""
    WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS token
        FROM documents),
    dl AS (SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY doc_id),
    consts AS (
        SELECT CAST(COUNT(*) AS DOUBLE) AS n, AVG(CAST(dl AS DOUBLE)) AS avgdl
        FROM dl),
    tf AS (
        SELECT doc_id, token, CAST(COUNT(*) AS DOUBLE) AS tf
        FROM tok
        WHERE token IN ({terms_sql})
        GROUP BY doc_id, token),
    df AS (
        SELECT token, CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS df
        FROM tf GROUP BY token),
    scored AS (
        SELECT t.doc_id,
               ROUND(SUM(
                   LN((c.n - d.df + 0.5) / (d.df + 0.5) + 1.0)
                   * t.tf * ({_K1} + 1.0)
                   / (t.tf + {_K1} * (1.0 - {_B} + {_B} * l.dl / c.avgdl))
               ), 6) AS bm25
        FROM tf t
        JOIN df d USING (token)
        JOIN dl l USING (doc_id)
        CROSS JOIN consts c
        GROUP BY t.doc_id),
    feedback AS (
        SELECT doc_id, bm25 FROM scored
        ORDER BY bm25 DESC, doc_id ASC LIMIT {_RM3_FB_DOCS}),
    wsum AS (SELECT SUM(CAST(bm25 AS DECIMAL(38,6))) AS s FROM feedback),
    fbtok AS (
        SELECT f.doc_id,
               CAST(f.bm25 AS DOUBLE) / CAST(w.s AS DOUBLE) AS wt,
               t.token, CAST(COUNT(*) AS DOUBLE) AS tf, MAX(l.dl) AS dl
        FROM feedback f
        JOIN tok t ON t.doc_id = f.doc_id
        JOIN dl l ON l.doc_id = f.doc_id
        CROSS JOIN wsum w
        GROUP BY f.doc_id, f.bm25, w.s, t.token),
    rm AS (
        SELECT token,
               CAST(SUM(CAST(wt * tf / dl AS DECIMAL(38,12))) AS DOUBLE) AS rm_w
        FROM fbtok
        WHERE LENGTH(token) >= 3 AND token NOT IN ({terms_sql})
        GROUP BY token)
    SELECT token AS expansion_term, ROUND(rm_w, 6) AS rm_weight
    FROM rm
    ORDER BY ROUND(rm_w, 6) DESC, token
    LIMIT {_RM3_EXP_TERMS}
    """


@query("rm3_query_expansion", oracle=_rm3_oracle())
def rm3_query_expansion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RM3 pseudo-relevance feedback (Lavrenko-Croft relevance models):
    take the BM25 top-{_RM3_FB_DOCS} for the fixed query, build the
    relevance model P(w|R) = Σ_D P(w|D)·weight(D) with BM25-normalized
    document weights, and emit the top-{_RM3_EXP_TERMS} expansion terms
    (original query terms excluded) — the classical two-pass query
    expansion that still anchors sparse-retrieval baselines.

    Pass 1 is the existing one-scan BM25 plan; the feedback set is
    {_RM3_FB_DOCS} rows riding a broadcast, so pass 2 touches only the
    feedback documents' tokens. P(w|D) values are exact rationals, the
    document weights derive from 6-dp-rounded BM25 scores through a
    DECIMAL total, and the relevance-model sum accumulates in DECIMAL —
    end-to-end engine-identical."""
    feedback = (
        _bm25_scored(spark, sf_dir)
        .orderBy(F.col("bm25").desc(), F.col("doc_id").asc())
        .limit(_RM3_FB_DOCS)
    )
    wsum = feedback.agg(
        F.sum(F.col("bm25").cast("decimal(38,6)")).alias("s")
    )
    fb = feedback.crossJoin(F.broadcast(wsum)).select(
        "doc_id",
        (F.col("bm25").cast("double") / F.col("s").cast("double")).alias("wt"),
    )
    d = table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
    dl = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    fbtok = (
        tok.join(F.broadcast(fb), "doc_id")
        .join(F.broadcast(dl.join(F.broadcast(fb.select("doc_id")), "doc_id")), "doc_id")
        .groupBy("doc_id", "wt", "token")
        .agg(F.count(F.lit(1)).cast("double").alias("tf"), F.max("dl").alias("dl"))
    )
    rm = (
        fbtok.filter(
            (F.length("token") >= 3) & (~F.col("token").isin(list(_TERMS)))
        )
        .groupBy("token")
        .agg(
            F.sum(
                (F.col("wt") * F.col("tf") / F.col("dl")).cast("decimal(38,12)")
            )
            .cast("double")
            .alias("rm_w")
        )
    )
    return (
        rm.select(
            F.col("token").alias("expansion_term"),
            F.round("rm_w", 6).alias("rm_weight"),
        )
        .orderBy(F.col("rm_weight").desc(), "expansion_term")
        .limit(_RM3_EXP_TERMS)
    )


@query(
    "curriculum_perplexity_stages",
    oracle=f"""
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    docbg AS (
        SELECT doc_id, w[i:i] [1] AS w1, w[i+1:i+1] [1] AS w2
        FROM w, unnest(generate_series(1, len(w) - 1)) AS t(i)),
    bg AS (SELECT w1, w2, CAST(COUNT(*) AS DOUBLE) AS c
           FROM docbg GROUP BY 1, 2),
    uni AS (SELECT w1, SUM(c) AS cw1 FROM bg GROUP BY w1),
    fanout AS (SELECT w1, CAST(COUNT(*) AS DOUBLE) AS n_types FROM bg GROUP BY w1),
    cont AS (SELECT w2, CAST(COUNT(*) AS DOUBLE) AS n_left FROM bg GROUP BY w2),
    totals AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_bigram_types FROM bg),
    pkn AS (
        SELECT b.w1, b.w2,
               GREATEST(b.c - {_KN_D}, 0) / u.cw1
                 + ({_KN_D} * f.n_types / u.cw1)
                   * (ct.n_left / t.n_bigram_types) AS p
        FROM bg b
        JOIN uni u ON u.w1 = b.w1
        JOIN fanout f ON f.w1 = b.w1
        JOIN cont ct ON ct.w2 = b.w2
        CROSS JOIN totals t),
    perdoc AS (
        SELECT d.doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
               ROUND(-CAST(SUM(CAST(LN(p.p) AS DECIMAL(38,12))) AS DOUBLE)
                     / COUNT(*), 6) AS xent
        FROM docbg d JOIN pkn p ON d.w1 = p.w1 AND d.w2 = p.w2
        GROUP BY d.doc_id)
    SELECT doc_id, n_bigrams, xent, ROUND(EXP(xent), 4) AS ppl,
           CAST(NTILE(4) OVER (ORDER BY xent ASC, doc_id ASC) AS INT) AS stage
    FROM perdoc
    ORDER BY doc_id
    """,
)
def curriculum_perplexity_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-ordered curriculum staging: score every document's
    cross-entropy under the corpus's own Kneser-Ney bigram LM, then
    split the corpus into 4 curriculum stages (easy -> hard quartiles)
    — the 'train on low-perplexity data first' schedule used by
    curriculum pretraining, and the same scoring that powers
    perplexity-based quality filtering (CCNet uses a KenLM exactly this
    way).

    Plan: the KN model is vocabulary-bounded frames joined once into
    the exploded doc-bigram relation (every doc bigram hits the model
    — it was trained on this corpus, no OOV path). Per-term log-probs
    are identical doubles in both engines, summed in DECIMAL so the
    per-doc entropy is order-independent. The quartile assignment uses
    the distributed range-partition ranking (global_row_number +
    ntile_from_rank) instead of a single-partition NTILE window, keyed
    on the rounded entropy with a doc_id tie-break so both engines
    rank the identical total order.

    Both bigram slots are DICTIONARY-ENCODED to 64-bit xxhash64 ids at
    the scan (round-3 probe follow-up): the KN model is pure count
    algebra over bigram IDENTITY — no string ordering or output
    anywhere — so every shuffle (bigram/unigram/fanout/continuation
    counts) and the model join carry longs instead of prose strings,
    ~4x fewer key bytes. Collision odds ~|V|²/2⁶⁵; an adversarial
    vocabulary would swap in a join-based exact dictionary."""
    from ..functions.ranks import global_row_number, ntile_from_rank

    d = table(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("w")
    )
    count = F.size("w") - 1
    docbg = d.select(
        "doc_id",
        F.explode(
            F.when(
                count >= 1,
                F.transform(
                    F.sequence(F.lit(1), count),
                    lambda i: F.struct(
                        F.xxhash64(F.element_at("w", i)).alias("w1"),
                        F.xxhash64(F.element_at("w", i + 1)).alias("w2"),
                    ),
                ),
            ).otherwise(F.array().cast("array<struct<w1:bigint,w2:bigint>>"))
        ).alias("p"),
    ).select("doc_id", "p.w1", "p.w2")
    bg = docbg.groupBy("w1", "w2").agg(F.count(F.lit(1)).cast("double").alias("c"))
    uni = bg.groupBy("w1").agg(F.sum("c").alias("cw1"))
    fanout = bg.groupBy("w1").agg(F.count(F.lit(1)).cast("double").alias("n_types"))
    cont = bg.groupBy("w2").agg(F.count(F.lit(1)).cast("double").alias("n_left"))
    totals = bg.agg(F.count(F.lit(1)).cast("double").alias("n_bigram_types"))
    p = (
        F.greatest(F.col("c") - _KN_D, F.lit(0.0)) / F.col("cw1")
        + (_KN_D * F.col("n_types") / F.col("cw1"))
        * (F.col("n_left") / F.col("n_bigram_types"))
    )
    pkn = (
        bg.join(uni, "w1")
        .join(fanout, "w1")
        .join(cont, "w2")
        .crossJoin(F.broadcast(totals))
        .select("w1", "w2", p.alias("p"))
    )
    perdoc = (
        docbg.join(pkn.hint("shuffle_hash"), ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
            F.round(
                -F.sum(F.log(F.col("p")).cast("decimal(38,12)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("xent"),
        )
    )
    ranked, n = global_row_number(
        perdoc, [F.col("xent").asc(), F.col("doc_id").asc()], rn_name="rn"
    )
    return ranked.select(
        "doc_id",
        "n_bigrams",
        "xent",
        F.round(F.exp("xent"), 4).alias("ppl"),
        ntile_from_rank(F.col("rn"), n, 4).alias("stage"),
    ).orderBy("doc_id")


# --- ColBERT-style MaxSim late interaction -----------------------------------

_MAXSIM_NQ = 4  # query vectors: vec_id < 4
_MAXSIM_TOKENS = 8  # 64-dim vector sliced into 8 tokens x 8 dims
_MAXSIM_DIM = 8
_MAXSIM_TOPK = 3


@query(
    "retrieval_maxsim_late_interaction",
    oracle=f"""
    WITH q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS e
               FROM embeddings WHERE vec_id < {_MAXSIM_NQ}),
    d AS (SELECT vec_id AS did, CAST(embedding AS DOUBLE[]) AS e
          FROM embeddings WHERE vec_id >= {_MAXSIM_NQ}),
    pairs AS (
        SELECT qid, did,
               list_reduce(
                   list_transform(generate_series(0, {_MAXSIM_TOKENS - 1}),
                       i -> list_max(list_transform(
                                generate_series(0, {_MAXSIM_TOKENS - 1}),
                                j -> list_dot_product(
                                    q.e[i * {_MAXSIM_DIM} + 1 : i * {_MAXSIM_DIM} + {_MAXSIM_DIM}],
                                    d.e[j * {_MAXSIM_DIM} + 1 : j * {_MAXSIM_DIM} + {_MAXSIM_DIM}])))),
                   (acc, x) -> acc + x) AS score
        FROM q, d),
    ranked AS (
        SELECT qid, did, score,
               ROW_NUMBER() OVER (PARTITION BY qid
                                  ORDER BY score DESC, did ASC) AS rk
        FROM pairs)
    SELECT qid AS query_id, did AS doc_vec_id, rk AS rank,
           ROUND(score, 6) AS maxsim_score
    FROM ranked WHERE rk <= {_MAXSIM_TOPK}
    ORDER BY query_id, rank
    """,
)
def retrieval_maxsim_late_interaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ColBERT-style late-interaction scoring (Khattab & Zaharia 2020):
    score(q, d) = sum over query tokens of the MAX dot product against
    any document token — the retrieval scorer that keeps per-token
    embeddings instead of pooling, here with each 64-dim vector sliced
    into 8 "token" sub-vectors of 8 dims (the testdata has no real
    token-level embeddings; the slicing gives the exact computation
    shape at 1/8 the width).

    Scale shape: queries (tiny) BROADCAST against the document corpus,
    so the score stage is embarrassingly parallel and linear in docs —
    never a doc x doc product. Token slices are PROJECTED columns
    (functions/textfns.py PERF CONTRACT) built once per side; the
    MaxSim double loop is JVM-side HOFs (aggregate over query tokens,
    array_max + transform over doc tokens, zip_with dot) — a strict
    left-to-right fold, so the float sum order is deterministic and
    matches the oracle's list_reduce exactly. Top-k per query is a
    window over the per-query score stream ({_MAXSIM_NQ} partitions).
    At 100 TB you'd pre-prune candidates with sim_ann_lsh_bucketed and
    MaxSim-rescore only the survivors — same plan, narrower input."""
    emb = table(spark, sf_dir, "embeddings")
    toks = F.transform(
        F.sequence(F.lit(0), F.lit(_MAXSIM_TOKENS - 1)),
        lambda i: F.slice(
            F.col("e"), i * _MAXSIM_DIM + 1, _MAXSIM_DIM
        ),
    )
    base = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    q = (
        base.filter(F.col("vec_id") < _MAXSIM_NQ)
        .select(F.col("vec_id").alias("query_id"), toks.alias("qt"))
    )
    d = (
        base.filter(F.col("vec_id") >= _MAXSIM_NQ)
        .select(F.col("vec_id").alias("doc_vec_id"), toks.alias("dt"))
    )
    tok_dot = lambda a, b: F.aggregate(  # noqa: E731
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )
    score = F.aggregate(
        F.col("qt"),
        F.lit(0.0),
        lambda acc, qt: acc
        + F.array_max(F.transform(F.col("dt"), lambda dt: tok_dot(qt, dt))),
    )
    scored = d.crossJoin(F.broadcast(q)).select(
        "query_id", "doc_vec_id", score.alias("score")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _MAXSIM_TOPK)
        .select(
            "query_id",
            "doc_vec_id",
            "rank",
            F.round("score", 6).alias("maxsim_score"),
        )
        .orderBy("query_id", "rank")
    )


_WAND_K = 20


@query(
    "retrieval_wand_prune_certificate",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS token
        FROM documents),
    per_doc AS (
        SELECT doc_id, CAST(COUNT(*) AS DOUBLE) AS dl,
               CAST(SUM(CASE WHEN token = '{_TERMS[0]}' THEN 1 ELSE 0 END) AS DOUBLE) AS tf_0,
               CAST(SUM(CASE WHEN token = '{_TERMS[1]}' THEN 1 ELSE 0 END) AS DOUBLE) AS tf_1,
               CAST(SUM(CASE WHEN token = '{_TERMS[2]}' THEN 1 ELSE 0 END) AS DOUBLE) AS tf_2
        FROM tok GROUP BY doc_id),
    consts AS (
        SELECT CAST(COUNT(*) AS DOUBLE) AS n, AVG(dl) AS avgdl,
               CAST(SUM(CASE WHEN tf_0 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df_0,
               CAST(SUM(CASE WHEN tf_1 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df_1,
               CAST(SUM(CASE WHEN tf_2 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df_2
        FROM per_doc),
    scored AS (
        SELECT p.doc_id,
               LN((c.n - c.df_0 + 0.5) / (c.df_0 + 0.5) + 1.0) * p.tf_0 * ({_K1} + 1.0)
                   / (p.tf_0 + {_K1} * (1.0 - {_B} + {_B} * p.dl / c.avgdl)) AS c0,
               LN((c.n - c.df_1 + 0.5) / (c.df_1 + 0.5) + 1.0) * p.tf_1 * ({_K1} + 1.0)
                   / (p.tf_1 + {_K1} * (1.0 - {_B} + {_B} * p.dl / c.avgdl)) AS c1,
               LN((c.n - c.df_2 + 0.5) / (c.df_2 + 0.5) + 1.0) * p.tf_2 * ({_K1} + 1.0)
                   / (p.tf_2 + {_K1} * (1.0 - {_B} + {_B} * p.dl / c.avgdl)) AS c2,
               p.tf_0, p.tf_1, p.tf_2
        FROM per_doc p CROSS JOIN consts c
        WHERE p.tf_0 + p.tf_1 + p.tf_2 > 0),
    tot AS (SELECT doc_id, c0 + c1 + c2 AS score, tf_0, tf_1, tf_2 FROM scored),
    ub AS (SELECT MAX(c0) AS ub_0, MAX(c1) AS ub_1, MAX(c2) AS ub_2 FROM scored),
    theta AS (
        SELECT MIN(score) AS theta FROM (
            SELECT score FROM tot ORDER BY score DESC, doc_id ASC LIMIT {_WAND_K})),
    audit AS (
        SELECT t.doc_id, t.score,
               (CASE WHEN t.tf_0 > 0 THEN u.ub_0 ELSE 0 END
                + CASE WHEN t.tf_1 > 0 THEN u.ub_1 ELSE 0 END
                + CASE WHEN t.tf_2 > 0 THEN u.ub_2 ELSE 0 END) AS ub_sum,
               th.theta,
               ROW_NUMBER() OVER (ORDER BY t.score DESC, t.doc_id ASC) AS rk
        FROM tot t, ub u, theta th)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_matching,
           ROUND(MAX(theta), 6) AS theta,
           CAST(SUM(CASE WHEN ub_sum < theta THEN 1 ELSE 0 END) AS BIGINT) AS n_prunable,
           ROUND(SUM(CASE WHEN ub_sum < theta THEN 1.0 ELSE 0 END) / COUNT(*), 6)
               AS prune_fraction,
           CAST(SUM(CASE WHEN ub_sum < theta AND rk <= {_WAND_K} THEN 1 ELSE 0 END)
               AS BIGINT) AS pruned_topk_overlap
    FROM audit
    """,
)
def retrieval_wand_prune_certificate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WAND (Broder et al. 2003) max-score pruning audit for the BM25
    query: each term's upper bound UB_t = max per-doc contribution of
    t; a candidate whose matched-term UB sum falls below the top-k
    threshold theta can be skipped WITHOUT full scoring. The query
    computes both legs — the bound and the exact ranking — and
    certifies in-query that no prunable document reaches the true
    top-k (`pruned_topk_overlap` must be 0, since ub_sum >= score by
    construction), plus the fraction of the posting volume the bound
    would skip.

    Scale shape: identical to text_bm25_topk's one-scan conditional
    aggregation; the three extra frames (UB row, theta row) are global
    aggregates over the per-doc frame that Catalyst feeds from a
    ReusedExchange, and each is a 1-row broadcast into the audit
    projection. The global ROW_NUMBER runs on candidates matching >= 1
    query term (df-bounded, not corpus-bounded); at 100 TB the exact
    leg is the thing WAND avoids — here it's the certificate's ground
    truth, same pattern as the dedup family's bounded certificates."""
    d = table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("token"))
    per_doc = tok.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("double").alias("dl"),
        *[
            F.sum((F.col("token") == t).cast("double")).alias(f"tf_{i}")
            for i, t in enumerate(_TERMS)
        ],
    )
    consts = per_doc.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.avg("dl").alias("avgdl"),
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("double")).alias(f"df_{i}")
            for i in range(len(_TERMS))
        ],
    )
    matched = per_doc.filter(
        sum([F.col(f"tf_{i}") for i in range(1, len(_TERMS))], F.col("tf_0")) > 0
    )
    scored = matched.crossJoin(F.broadcast(consts))
    for i in range(len(_TERMS)):
        tf, df = F.col(f"tf_{i}"), F.col(f"df_{i}")
        idf = F.log((F.col("n") - df + 0.5) / (df + 0.5) + 1.0)
        denom = tf + _K1 * (1.0 - _B + _B * F.col("dl") / F.col("avgdl"))
        scored = scored.withColumn(f"c_{i}", idf * tf * (_K1 + 1.0) / denom)
    scored = scored.withColumn(
        "score", F.col("c_0") + F.col("c_1") + F.col("c_2")
    ).select("doc_id", "score", "tf_0", "tf_1", "tf_2", "c_0", "c_1", "c_2")
    ub = scored.agg(
        *[F.max(f"c_{i}").alias(f"ub_{i}") for i in range(len(_TERMS))]
    )
    theta = (
        scored.orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(_WAND_K)
        .agg(F.min("score").alias("theta"))
    )
    from ..functions.ranks import global_row_number

    ranked, _n = global_row_number(
        scored, [F.col("score").desc(), F.col("doc_id").asc()], "rk"
    )
    audit = ranked.crossJoin(F.broadcast(ub)).crossJoin(F.broadcast(theta)).withColumn(
        "ub_sum",
        F.when(F.col("tf_0") > 0, F.col("ub_0")).otherwise(F.lit(0.0))
        + F.when(F.col("tf_1") > 0, F.col("ub_1")).otherwise(F.lit(0.0))
        + F.when(F.col("tf_2") > 0, F.col("ub_2")).otherwise(F.lit(0.0)),
    )
    prunable = (F.col("ub_sum") < F.col("theta")).cast("int")
    return audit.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_matching"),
        F.round(F.max("theta"), 6).alias("theta"),
        F.sum(prunable).cast("bigint").alias("n_prunable"),
        F.round(F.sum(prunable.cast("double")) / F.count(F.lit(1)), 6).alias(
            "prune_fraction"
        ),
        F.sum(
            (prunable.cast("boolean") & (F.col("rk") <= _WAND_K)).cast("int")
        ).cast("bigint").alias("pruned_topk_overlap"),
    )
