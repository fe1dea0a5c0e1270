"""Scalar function surface (SURVEY.md §2C "Scalar functions").

String / date / math / array / map / JSON expressions — all built-in
``pyspark.sql.functions`` (JVM-side, whole-stage-codegen'd; zero Python
in the hot path). Integer-valued computed columns are cast to BIGINT on
both sides because DuckDB's length/year/etc. return BIGINT while Spark's
return INT.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..catalog import table
from ..registry import query


@query(
    "scalar_string_fns",
    oracle="""
    SELECT c_custkey,
           UPPER(c_mktsegment)                        AS seg_upper,
           LOWER(c_name)                              AS name_lower,
           SUBSTR(c_name, 1, 10)                      AS name10,
           c_name || '/' || c_mktsegment              AS name_seg,
           CAST(LENGTH(c_name) AS BIGINT)             AS name_len,
           REPLACE(c_name, 'Customer#', 'C-')         AS short_name,
           CASE WHEN c_name LIKE '%00' THEN 1 ELSE 0 END AS ends_00
    FROM customer
    """,
)
def scalar_string_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """upper/lower/substr/concat/length/replace/LIKE."""
    c = table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_mktsegment").alias("seg_upper"),
        F.lower("c_name").alias("name_lower"),
        F.substring("c_name", 1, 10).alias("name10"),
        F.concat(F.col("c_name"), F.lit("/"), F.col("c_mktsegment")).alias("name_seg"),
        F.length("c_name").cast("long").alias("name_len"),
        F.regexp_replace("c_name", "Customer#", "C-").alias("short_name"),
        F.when(F.col("c_name").like("%00"), F.lit(1)).otherwise(F.lit(0)).alias("ends_00"),
    )


@query(
    "scalar_regexp",
    oracle="""
    SELECT doc_id,
           regexp_extract(text, '^(\\w+)', 1)                         AS first_word,
           CAST(LENGTH(regexp_replace(text, '[aeiou]', '', 'g')) AS BIGINT) AS n_consonant_chars,
           regexp_matches(text, 'spark')                              AS mentions_spark
    FROM documents
    """,
)
def scalar_regexp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """regexp extract / replace / match over documents."""
    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.regexp_extract("text", r"^(\w+)", 1).alias("first_word"),
        F.length(F.regexp_replace("text", "[aeiou]", "")).cast("long").alias(
            "n_consonant_chars"
        ),
        F.col("text").rlike("spark").alias("mentions_spark"),
    )


@query(
    "scalar_date_fns",
    oracle="""
    SELECT event_id,
           CAST(year(ts) AS BIGINT)     AS y,
           CAST(month(ts) AS BIGINT)    AS m,
           CAST(day(ts) AS BIGINT)      AS d,
           CAST(hour(ts) AS BIGINT)     AS h,
           CAST(date_trunc('day', ts) AS TIMESTAMP)  AS day_start,
           CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour_start,
           CAST(datediff('day', TIMESTAMP '2024-01-01 00:00:00', ts) AS BIGINT) AS days_since_jan1
    FROM events
    """,
)
def scalar_date_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """year/month/day/hour/date_trunc/datediff (session TZ pinned UTC)."""
    e = table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.year("ts").cast("long").alias("y"),
        F.month("ts").cast("long").alias("m"),
        F.dayofmonth("ts").cast("long").alias("d"),
        F.hour("ts").cast("long").alias("h"),
        F.date_trunc("day", F.col("ts")).alias("day_start"),
        F.date_trunc("hour", F.col("ts")).alias("hour_start"),
        F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date"))
        .cast("long")
        .alias("days_since_jan1"),
    )


@query(
    "scalar_math_fns",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(l_extendedprice * l_discount, 4)        AS disc_amount,
           ABS(l_discount - 0.05)                        AS disc_dev,
           ROUND(LN(l_extendedprice), 6)                 AS ln_price,
           ROUND(SQRT(l_quantity), 6)                    AS sqrt_qty,
           ROUND(POWER(1 + l_tax, 2), 6)                 AS tax_sq,
           CAST(CEIL(l_quantity / 10.0) AS BIGINT)       AS qty_decile,
           CAST(FLOOR(l_extendedprice / 1000.0) AS BIGINT) AS price_k,
           CAST(l_partkey % 7 AS BIGINT)                 AS pk_mod7
    FROM lineitem
    """,
)
def scalar_math_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """round/abs/ln/sqrt/power/ceil/floor/mod."""
    li = table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.col("l_extendedprice") * F.col("l_discount"), 4).alias("disc_amount"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.round(F.log(F.col("l_extendedprice")), 6).alias("ln_price"),
        F.round(F.sqrt("l_quantity"), 6).alias("sqrt_qty"),
        F.round(F.pow(1 + F.col("l_tax"), 2), 6).alias("tax_sq"),
        F.ceil(F.col("l_quantity") / 10.0).cast("long").alias("qty_decile"),
        F.floor(F.col("l_extendedprice") / 1000.0).cast("long").alias("price_k"),
        (F.col("l_partkey") % 7).cast("long").alias("pk_mod7"),
    )


@query(
    "scalar_array_fns",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS BIGINT)                              AS dim,
           ROUND(CAST(embedding[1] AS DOUBLE), 6)                      AS first_elem,
           ROUND(list_sum(list_transform(embedding,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), 6)      AS sq_norm,
           CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT)     AS n_positive
    FROM embeddings
    """,
)
def scalar_array_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions over the embedding column — the
    JVM-side (non-UDF) path for vector math at scale."""
    e = table(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        F.size("embedding").cast("long").alias("dim"),
        F.round(F.element_at("embedding", 1).cast("double"), 6).alias("first_elem"),
        F.round(
            F.aggregate(
                "embedding",
                F.lit(0.0).cast("double"),
                lambda acc, v: acc + v.cast("double") * v.cast("double"),
            ),
            6,
        ).alias("sq_norm"),
        F.size(F.filter("embedding", lambda v: v > 0)).cast("long").alias("n_positive"),
    )


@query(
    "scalar_json_fns",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT)     AS prop_k,
           array_to_string(list_sort(json_keys(props)), ',')     AS prop_keys
    FROM events
    """,
)
def scalar_json_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction from the events.props payload (reference parity:
    from_json usage at /root/reference/src/consumer/batch_parsers.py:135-141).
    Key list emitted as a joined string so the output is value-hashable."""
    e = table(spark, sf_dir, "events")
    props_map = F.from_json("props", T.MapType(T.StringType(), T.StringType()))
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("prop_k"),
        F.array_join(F.array_sort(F.map_keys(props_map)), ",").alias("prop_keys"),
    )


@query(
    "scalar_case_conditional",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice >= 300000 THEN 'high'
                WHEN o_totalprice >= 100000 THEN 'mid'
                ELSE 'low' END                                AS price_band,
           COALESCE(NULLIF(o_orderstatus, 'O'), 'OPEN')       AS status_label,
           CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END AS is_urgent
    FROM orders
    """,
)
def scalar_case_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN / NULLIF / COALESCE / IN."""
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") >= 300000, "high")
        .when(F.col("o_totalprice") >= 100000, "mid")
        .otherwise("low")
        .alias("price_band"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("OPEN")).alias(
            "status_label"
        ),
        F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), F.lit(1))
        .otherwise(F.lit(0))
        .alias("is_urgent"),
    )


@query(
    "scalar_hash_fns",
    oracle="""
    SELECT doc_id,
           md5(text)                                        AS text_md5,
           sha256(text)                                     AS text_sha256
    FROM documents
    """,
)
def scalar_hash_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cryptographic content hashes (the exact-dedup key primitive)."""
    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.md5("text").alias("text_md5"),
        F.sha2("text", 256).alias("text_sha256"),
    )


@query(
    "scalar_null_safe_eq",
    oracle="""
    SELECT o_orderkey,
           NULLIF(o_orderstatus, 'O')                                 AS maybe_status,
           CASE WHEN NULLIF(o_orderstatus, 'O') IS NOT DISTINCT FROM NULLIF(o_orderpriority, '5-LOW')
                THEN 1 ELSE 0 END                                     AS nullsafe_match,
           CASE WHEN NULLIF(o_orderstatus, 'O') = NULLIF(o_orderpriority, '5-LOW')
                THEN 1 ELSE 0 END                                     AS plain_match
    FROM orders
    """,
)
def scalar_null_safe_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality (<=> / IS NOT DISTINCT FROM) vs plain = on
    nullable computed columns (NULL <=> NULL is TRUE; NULL = NULL is
    NULL, folded to 0 by the CASE)."""
    o = table(spark, sf_dir, "orders")
    a = F.nullif(F.col("o_orderstatus"), F.lit("O"))
    b = F.nullif(F.col("o_orderpriority"), F.lit("5-LOW"))
    return o.select(
        "o_orderkey",
        a.alias("maybe_status"),
        F.when(a.eqNullSafe(b), F.lit(1)).otherwise(F.lit(0)).alias("nullsafe_match"),
        F.when(a == b, F.lit(1)).otherwise(F.lit(0)).alias("plain_match"),
    )


@query(
    "scalar_map_fns",
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k')                 AS k_via_map,
           CAST(len(json_keys(props)) AS BIGINT)             AS n_keys,
           list_contains(json_keys(props), 'k')              AS has_k
    FROM events
    """,
)
def scalar_map_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-typed payload access: element_at / size / array_contains over
    a map parsed from the JSON props (reference properties map shape,
    FIXTURES.md §1)."""
    e = table(spark, sf_dir, "events")
    m = F.from_json("props", T.MapType(T.StringType(), T.StringType()))
    return e.select(
        "event_id",
        F.element_at(m, "k").alias("k_via_map"),
        F.size(m).cast("long").alias("n_keys"),
        F.array_contains(F.map_keys(m), "k").alias("has_k"),
    )
