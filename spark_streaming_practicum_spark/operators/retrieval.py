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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
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
        .orderBy(F.col("bm25").desc(), F.col("doc_id").asc())
        .limit(20)
    )
