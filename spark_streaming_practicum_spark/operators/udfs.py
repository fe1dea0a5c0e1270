"""UDF surface (SURVEY.md §2C "UDF surface"): one scalar pandas UDF, one
grouped-map (applyInPandas), one pandas UDAF — each with SQL-replicable
semantics so the oracle stays exact.

The reference itself has zero UDFs (SURVEY.md §2A) — every transform is
built-in Column expressions. These exist to pin down the sanctioned slow
path: Arrow-batched pandas UDFs, never row-at-a-time Python.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..catalog import table
from ..registry import query


@query(
    "udf_pandas_scalar",
    oracle="""
    SELECT doc_id,
           lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS norm_text_prefix
    FROM documents
    WHERE doc_id < 50
    """,
)
def udf_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar pandas UDF (Arrow-vectorized string normalization)."""

    @pandas_udf("string")
    def normalize(s: pd.Series) -> pd.Series:
        return s.str.replace(r"\s+", " ", regex=True).str.strip().str.lower()

    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    return d.select("doc_id", normalize("text").alias("norm_text_prefix"))


@query(
    "udf_grouped_map_zscore",
    oracle="""
    SELECT event_id, user_id,
           ROUND(CASE WHEN stddev_pop(value) OVER (PARTITION BY user_id) = 0 THEN 0.0
                      ELSE (value - AVG(value) OVER (PARTITION BY user_id))
                           / stddev_pop(value) OVER (PARTITION BY user_id)
                 END, 5) AS zscore
    FROM events
    """,
)
def udf_grouped_map_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInPandas: per-user z-score of event values.

    One shuffle on user_id, then a whole-group pandas frame per task —
    the pattern for per-entity model scoring at scale."""

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        std = float(pdf["value"].std(ddof=0))
        mean = float(pdf["value"].mean())
        z = np.zeros(len(pdf)) if std == 0.0 else (pdf["value"].to_numpy() - mean) / std
        return pd.DataFrame(
            {"event_id": pdf["event_id"], "user_id": pdf["user_id"], "zscore": np.round(z, 5)}
        )

    e = table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    return e.groupBy("user_id").applyInPandas(
        zscore, schema="event_id bigint, user_id bigint, zscore double"
    )


@query(
    "udf_grouped_agg_median",
    oracle="""
    SELECT event_type, ROUND(median(value), 5) AS median_value
    FROM events
    GROUP BY event_type
    """,
)
def udf_grouped_agg_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pandas UDAF: exact median per group (numpy median == DuckDB's
    interpolated median for even counts)."""

    @pandas_udf("double")
    def median_udaf(v: pd.Series) -> float:
        return float(np.median(v.to_numpy()))

    e = table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.round(median_udaf("value"), 5).alias("median_value")
    )


@query(
    "udtf_sentence_segments",
    oracle="""
    WITH sel AS (SELECT doc_id, text FROM documents WHERE doc_id % 50 = 0),
    segs AS (
        SELECT doc_id,
               generate_subscripts(string_split(text, '.'), 1) - 1 AS seg_idx,
               unnest(string_split(text, '.')) AS seg
        FROM sel)
    SELECT doc_id, seg_idx,
           LENGTH(TRIM(seg)) AS n_chars,
           len(string_split(TRIM(seg), ' ')) AS n_words
    FROM segs
    WHERE LENGTH(TRIM(seg)) > 0
    """,
)
def udtf_sentence_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python user-defined TABLE function (Spark 3.5+): one input row ->
    many output rows, invoked per-row via LATERAL — here a sentence
    segmenter emitting (doc_id, seg_idx, n_chars, n_words) per segment,
    the row-generating shape (chunkers, parsers, taggers) scalar UDFs
    can't express.

    This completes the UDF surface (scalar pandas / grouped map /
    grouped agg / table function). UDTFs execute Python row-at-a-time,
    so they are the LAST resort — the identical segmentation is pure
    JVM via explode(split(...)) (see text_chunk_fixed_tokens); the
    input is subsampled accordingly. The oracle re-states the
    segmentation relationally."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id bigint, seg_idx int, n_chars int, n_words int")
    class SentenceSegments:
        def eval(self, doc_id: int, text: str):
            idx = 0
            for seg in text.split("."):
                stripped = seg.strip()
                if stripped:
                    yield (doc_id, idx, len(stripped), len(stripped.split(" ")))
                idx += 1

    spark.udtf.register("sentence_segments", SentenceSegments)
    table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 50 == 0
    ).createOrReplaceTempView("udtf_docs_in")
    return spark.sql(
        "SELECT s.* FROM udtf_docs_in d, "
        "LATERAL sentence_segments(d.doc_id, d.text) s"
    )
