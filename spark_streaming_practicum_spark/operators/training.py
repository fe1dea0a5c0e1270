"""Training-data pipeline operators (north star extension).

The split / sample / redact verbs every LLM-corpus pipeline needs in
front of training: deterministic hash-based train/val/test assignment,
per-stratum deterministic downsampling, and PII redaction. All pure
column expressions (JVM-side), all DuckDB-oracled.

Determinism policy: splits and samples are driven by the same
polynomial character hash used for fingerprinting
(``functions.textfns.poly_hash`` — SQL-reproducible via
``list_reduce``), NOT by ``rand()``. At 100 TB a reshuffle-stable,
engine-independent assignment is what makes experiments reproducible
and lets train/test membership be recomputed from the key alone —
no assignment table to store or join.

The reference has no training surface (it stops at bronze ingest,
/root/reference/README.md:58-72); this module is part of the
BASELINE.json north-star extension set.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..functions.textfns import poly_hash
from ..registry import query

# DuckDB mirror of poly_hash over an arbitrary string expression.
_POLY_SQL = (
    "list_reduce(list_transform(generate_series(1, LENGTH({e})), "
    "i -> CAST(ascii(({e})[i:i]) AS BIGINT)), (acc, x) -> (acc * 131 + x) % 1000000007)"
)


def _bucket(col: Column, n: int = 100) -> Column:
    """Deterministic [0, n) bucket from a string key."""
    return poly_hash(col) % n


def _bucket_sql(expr: str, n: int = 100) -> str:
    return f"({_POLY_SQL.format(e=expr)} % {n})"


@query(
    "split_train_val_test",
    oracle=f"""
    SELECT doc_id,
           {_bucket_sql("CAST(doc_id AS VARCHAR)")} AS bucket,
           CASE WHEN {_bucket_sql("CAST(doc_id AS VARCHAR)")} < 80 THEN 'train'
                WHEN {_bucket_sql("CAST(doc_id AS VARCHAR)")} < 90 THEN 'val'
                ELSE 'test' END AS split
    FROM documents
    """,
)
def split_train_val_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test assignment by key hash.

    Membership is a pure function of ``doc_id`` — stable across runs,
    partitionings and engines, and requires no stored assignment table.
    Map-side only: zero shuffles at any scale."""
    d = table(spark, sf_dir, "documents")
    b = _bucket(F.col("doc_id").cast("string"))
    return d.select(
        "doc_id",
        b.alias("bucket"),
        F.when(b < 80, "train").when(b < 90, "val").otherwise("test").alias("split"),
    )


_SAMPLE_KEY = "'samp:' || CAST(doc_id AS VARCHAR)"
_RATE_SQL = "CASE lang WHEN 'en' THEN 20 WHEN 'es' THEN 50 ELSE 100 END"


@query(
    "sample_stratified_hash",
    oracle=f"""
    SELECT lang,
           COUNT(*) AS n_total,
           SUM(CASE WHEN {_bucket_sql(_SAMPLE_KEY)} < {_RATE_SQL}
                    THEN 1 ELSE 0 END) AS n_kept,
           ROUND(SUM(CASE WHEN {_bucket_sql(_SAMPLE_KEY)} < {_RATE_SQL}
                          THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 4) AS kept_ratio
    FROM documents
    GROUP BY lang
    """,
)
def sample_stratified_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified downsampling: keep 20% of 'en', 50% of
    'es', 100% of everything else — the language-rebalancing step of a
    corpus mix, driven by a seeded key hash instead of ``rand()`` so the
    sample is reproducible and join-stable. Reports per-language
    kept/total. (The kept rows themselves are the same filter without
    the aggregate.)"""
    d = table(spark, sf_dir, "documents")
    b = _bucket(F.concat(F.lit("samp:"), F.col("doc_id").cast("string")))
    rate = F.when(F.col("lang") == "en", 20).when(F.col("lang") == "es", 50).otherwise(100)
    kept = (b < rate).cast("long")
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum(kept).alias("n_kept"),
        F.round(F.sum(kept) / F.count(F.lit(1)), 4).alias("kept_ratio"),
    )


_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PHONE_RE = r"\+[0-9][0-9-]{5,}[0-9]"


@query(
    "text_pii_redact",
    oracle=f"""
    WITH enriched AS (
        SELECT doc_id,
               text || ' contact user' || CAST(doc_id AS VARCHAR)
                    || '@mail.example.com or +1-555-0' || CAST(doc_id % 100 AS VARCHAR)
                    || '22' AS with_pii
        FROM documents)
    SELECT doc_id,
           CAST(len(regexp_extract_all(with_pii, '{_EMAIL_RE}')) AS BIGINT) AS n_emails,
           CAST(len(regexp_extract_all(with_pii, '{_PHONE_RE}')) AS BIGINT) AS n_phones,
           regexp_replace(regexp_replace(with_pii, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                          '{_PHONE_RE}', '<PHONE>', 'g') AS redacted
    FROM enriched
    """,
)
def text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction: mask emails and phone numbers, count occurrences.

    The synthetic corpus carries no PII, so the query deterministically
    plants one email + one phone per document first (making the
    redaction verifiable end-to-end), then redacts — the redaction
    expressions themselves are exactly what runs on a real corpus.
    Pure JVM regex, map-side only."""
    d = table(spark, sf_dir, "documents")
    with_pii = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@mail.example.com or +1-555-0"),
        (F.col("doc_id") % 100).cast("string"),
        F.lit("22"),
    )
    return d.select(
        "doc_id",
        F.size(F.regexp_extract_all(with_pii, F.lit(_EMAIL_RE), 0)).cast("long").alias("n_emails"),
        F.size(F.regexp_extract_all(with_pii, F.lit(_PHONE_RE), 0)).cast("long").alias("n_phones"),
        F.regexp_replace(
            F.regexp_replace(with_pii, _EMAIL_RE, "<EMAIL>"), _PHONE_RE, "<PHONE>"
        ).alias("redacted"),
    )
