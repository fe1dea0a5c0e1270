"""Ingestion-parity queries (SURVEY.md §2 Part A as oracle-checked batch ops).

These exercise the full reference pipeline — JSON-array batch synthesis,
explode/parse (A5-A10), required-field validation (A11), dead-letter
classification (A12), valid/invalid split (A13) — end-to-end against a
SQL oracle, by constructing the raw batches *deterministically from the
events table* with arithmetic fault injection:

    batch id            = event_id % 397           (collect_list per group)
    corrupted batch     = batch id % 10 == 0      (truncate at midpoint,
                          like producer/data_sinks.py:59-64)
    invalid-schema rec  = event_id % 101 == 7     (single bogus key, like
                          event_factory.py:134-138)
    extra-fields rec    = event_id % 103 == 11    (7th key appended)

so the oracle can reproduce the expected routing with WHERE clauses on
the original table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..catalog import table
from ..registry import query
from ..streaming.parser import JsonArrayBatchParser
from ..streaming.router import REASON, Router

TS_FMT = "yyyy-MM-dd HH:mm:ss.SSSSSS"

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), nullable=False),
        T.StructField("ts", T.TimestampType(), nullable=False),
        T.StructField("user_id", T.LongType(), nullable=False),
        T.StructField("event_type", T.StringType(), nullable=False),
        T.StructField("value", T.DoubleType(), nullable=True),
        T.StructField("props", T.StringType(), nullable=True),
    ]
)

JSON_OPTIONS = {"timestampFormat": TS_FMT}

_VALID_FILTER_SQL = (
    "(event_id % 397) % 10 != 0 AND event_id % 101 != 7 AND event_id % 103 != 11"
)


def _raw_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Serialize events into JSON-array batch strings with injected faults."""
    e = table(spark, sf_dir, "events")
    valid_rec = F.to_json(
        F.struct(
            F.col("event_id"),
            F.date_format("ts", TS_FMT).alias("ts"),
            F.col("user_id"),
            F.col("event_type"),
            F.col("value"),
            F.col("props"),
        )
    )
    invalid_rec = F.to_json(F.struct(F.lit("junk").alias("bogus")))
    extra_rec = F.to_json(
        F.struct(
            F.col("event_id"),
            F.date_format("ts", TS_FMT).alias("ts"),
            F.col("user_id"),
            F.col("event_type"),
            F.col("value"),
            F.col("props"),
            F.lit("x").alias("extra_field"),
        )
    )
    rec = (
        F.when(F.col("event_id") % 101 == 7, invalid_rec)
        .when(F.col("event_id") % 103 == 11, extra_rec)
        .otherwise(valid_rec)
    )
    # Repartition before the (CPU-heavy) to_json projection: the events
    # table is one parquet file, i.e. one scan task otherwise.
    e = e.repartition(spark.sparkContext.defaultParallelism, "event_id")
    batches = (
        e.select((F.col("event_id") % 397).alias("batch_id"), rec.alias("rec"))
        .groupBy("batch_id")
        .agg(F.concat(F.lit("["), F.array_join(F.collect_list("rec"), ","), F.lit("]")).alias("full"))
    )
    corrupted = F.col("batch_id") % 10 == 0
    return batches.select(
        F.when(
            corrupted, F.substring(F.col("full"), 1, (F.length("full") / 2).cast("int"))
        )
        .otherwise(F.col("full"))
        .alias("value")
    )


def _routed(spark: SparkSession, sf_dir: str):
    parser = JsonArrayBatchParser(EVENT_SCHEMA, JSON_OPTIONS)
    router = Router(EVENT_SCHEMA)
    parsed = parser.parse(_raw_batches(spark, sf_dir))
    return router.split(parsed)


@query(
    "ingest_route_valid_agg",
    oracle=f"""
    SELECT event_type,
           COUNT(*)                 AS n,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_value,
           MAX(ts)                  AS max_ts,
           MIN(event_id)            AS min_event_id
    FROM events
    WHERE {_VALID_FILTER_SQL}
    GROUP BY event_type
    """,
)
def ingest_route_valid_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full parse->validate->route pipeline; valid-path fidelity check
    (values, microsecond timestamps and keys survive the JSON round trip)."""
    valid = _routed(spark, sf_dir).valid
    return valid.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(38,6)")).cast("double").alias("sum_value"),
        F.max("ts").alias("max_ts"),
        F.min("event_id").alias("min_event_id"),
    )


@query(
    "ingest_dead_letter_reasons",
    oracle="""
    SELECT 'corrupted_batch' AS reason, COUNT(DISTINCT event_id % 397) AS n
    FROM events WHERE (event_id % 397) % 10 = 0
    UNION ALL
    SELECT 'invalid_schema' AS reason, COUNT(*) AS n
    FROM events WHERE event_id % 101 = 7 AND (event_id % 397) % 10 != 0
    UNION ALL
    SELECT 'extra_fields' AS reason, COUNT(*) AS n
    FROM events
    WHERE event_id % 103 = 11 AND event_id % 101 != 7 AND (event_id % 397) % 10 != 0
    """,
)
def ingest_dead_letter_reasons(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dead-letter reason breakdown (B3 parity — the reference's DuckDB
    demo query, /root/reference/demos/duckdb.tape:33), with reason
    precedence corrupted > invalid_schema > extra_fields."""
    dead = _routed(spark, sf_dir).dead_letters
    return dead.groupBy(F.col(REASON).alias("reason")).agg(F.count(F.lit(1)).alias("n"))


@query(
    "ingest_valid_roundtrip_sample",
    oracle=f"""
    SELECT event_id, ts, user_id, event_type, value, props
    FROM events
    WHERE {_VALID_FILTER_SQL}
    ORDER BY event_id ASC
    LIMIT 100
    """,
)
def ingest_valid_roundtrip_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level fidelity: first 100 valid records out of the pipeline
    must equal the original rows byte-for-byte (every column, every type)."""
    valid = _routed(spark, sf_dir).valid
    return valid.select("event_id", "ts", "user_id", "event_type", "value", "props").orderBy(
        F.col("event_id").asc()
    ).limit(100)


@query(
    "pipeline_bronze_to_gold",
    oracle=f"""
    WITH valid AS (
        SELECT * FROM events WHERE {_VALID_FILTER_SQL}),
    silver AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                     ORDER BY ts ASC, event_id ASC) AS rn
        FROM valid)
    SELECT event_type,
           COUNT(*)                                          AS n_users_first_events,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_value,
           MIN(ts)                                           AS earliest
    FROM silver WHERE rn = 1
    GROUP BY event_type
    """,
)
def pipeline_bronze_to_gold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed medallion pipeline: raw JSON batches -> (bronze) parse/
    validate/route -> (silver) keep-first dedup per (user, event_type) —
    the reference's deferred Silver design, README.md:58-68 -> (gold)
    per-type aggregates. One registered query exercising the operator
    library end-to-end as a user would compose it."""
    from pyspark.sql import Window as W

    valid = _routed(spark, sf_dir).valid
    w = W.partitionBy("user_id", "event_type").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    silver = valid.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    return silver.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_users_first_events"),
        F.sum(F.col("value").cast("decimal(38,6)")).cast("double").alias("sum_value"),
        F.min("ts").alias("earliest"),
    )
