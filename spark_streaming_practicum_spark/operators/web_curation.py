"""Web-corpus curation operators: URL parsing, per-domain quotas, vocab coverage.

Large-scale web-text pipelines (C4, RefinedWeb, Dolma) all share three
front-door steps that operate on the *provenance* of a document rather
than its content:

1. **URL normalization/parsing** — split a crawl URL into host / path /
   query components so later stages can filter by domain, dedupe by
   canonical path, or bucket by TLD. Spark's ``parse_url`` is a codegen'd
   JVM expression, so this stays in whole-stage codegen at any scale.
2. **Per-domain quota sampling** — RefinedWeb-style anti-bias control:
   no single domain may contribute more than N documents. The scalable
   formulation is a *deterministic priority* per document plus a ranking
   window partitioned by domain: one shuffle on the domain key, no
   global sort, no collect. (On skewed corpora the same priority column
   supports threshold sampling: compute the per-domain Nth-smallest
   priority with ``percentile_approx`` and filter, which removes the
   window entirely — both shapes shuffle only (domain, priority) pairs.)
3. **Vocabulary coverage / OOV rate** — given a top-K corpus vocabulary
   (the zeroth step of tokenizer training), measure what fraction of
   each document's tokens fall outside it. High OOV → boilerplate,
   non-linguistic noise, or language-ID misses. Two aggregates over one
   tokenized intermediate; the vocab (K rows) broadcasts.

The reference has no web-curation surface (it stops at bronze ingest,
/root/reference/README.md:58-72); these are north-star extension
operators over the ``documents`` table. The testdata has no URL column,
so a deterministic crawl URL is synthesized from (source, lang, doc_id)
— the *parsing* is the operator under test, and the oracle rebuilds the
same components with portable string functions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import query

# Knuth multiplicative-hash constants: portable integer arithmetic that
# both engines evaluate identically (unlike xxhash64, which DuckDB lacks).
_PRIORITY_SQL = "((doc_id % 1000003) * 2654435761) % 1000003"
_QUOTA = 10


def _with_url(d: DataFrame) -> DataFrame:
    return d.withColumn(
        "url",
        F.concat(
            F.lit("https://"),
            F.col("source"),
            F.lit(".example.com/"),
            F.col("lang"),
            F.lit("/doc/"),
            F.col("doc_id"),
            F.lit("?ref=r"),
            F.col("doc_id") % 7,
        ),
    )


@query(
    "url_parse_host_stats",
    oracle="""
    WITH u AS (
        SELECT doc_id, n_chars,
               source || '.example.com' AS host,
               '/' || lang || '/doc/' || doc_id AS path,
               'r' || (doc_id % 7) AS ref
        FROM documents)
    SELECT host, ref,
           COUNT(*) AS n_docs,
           COUNT(DISTINCT path) AS n_paths,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM u
    GROUP BY host, ref
    ORDER BY host, ref
    """,
)
def url_parse_host_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-frontier stats keyed by (host, query-param bucket).

    ``parse_url`` extracts HOST / PATH / QUERY:ref as codegen'd JVM
    expressions — no UDF, no regex in the hot path. The aggregate is a
    plain two-phase hash agg on a low-cardinality key; at 100 TB the
    map-side partials reduce each (host, ref) group to one row per task
    before the shuffle."""
    d = _with_url(table(spark, sf_dir, "documents"))
    parsed = d.select(
        F.parse_url(F.col("url"), F.lit("HOST")).alias("host"),
        F.parse_url(F.col("url"), F.lit("PATH")).alias("path"),
        F.parse_url(F.col("url"), F.lit("QUERY"), F.lit("ref")).alias("ref"),
        "n_chars",
    )
    return (
        parsed.groupBy("host", "ref")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("path").alias("n_paths"),
            F.sum("n_chars").alias("total_chars"),
        )
        .orderBy("host", "ref")
    )


@query(
    "domain_quota_sample",
    oracle=f"""
    WITH ranked AS (
        SELECT source, doc_id, lang,
               ROW_NUMBER() OVER (
                   PARTITION BY source
                   ORDER BY {_PRIORITY_SQL}, doc_id) AS rk
        FROM documents)
    SELECT source, doc_id, lang, rk
    FROM ranked
    WHERE rk <= {_QUOTA}
    ORDER BY source, rk
    """,
)
def domain_quota_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain document quota (max {N} docs/domain), deterministic.

    The priority is a multiplicative hash of doc_id — stable across
    runs, engines, and partitionings, so the sample is reproducible
    (unlike ``rand()``-based sampling). One shuffle on the domain key;
    the ranking window never materializes more than a task's rows."""
    d = table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(F.expr(_PRIORITY_SQL), F.col("doc_id"))
    return (
        d.select("source", "doc_id", "lang")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _QUOTA)
        .orderBy("source", "rk")
    )


@query(
    "vocab_oov_rate",
    oracle="""
    WITH tok AS (
        SELECT doc_id, lang, unnest(string_split(text, ' ')) AS token
        FROM documents),
    vocab AS (
        SELECT token FROM tok
        GROUP BY token
        ORDER BY COUNT(*) DESC, token ASC
        LIMIT 50),
    per_doc AS (
        SELECT t.doc_id, t.lang,
               COUNT(*) AS n_tokens,
               SUM(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) AS n_oov
        FROM tok t LEFT JOIN vocab v USING (token)
        GROUP BY t.doc_id, t.lang)
    SELECT lang,
           COUNT(*) AS n_docs,
           ROUND(AVG(CAST(n_oov AS DOUBLE) / n_tokens), 6) AS avg_oov_rate,
           ROUND(SUM(CAST(n_oov AS DOUBLE)) / SUM(n_tokens), 6) AS corpus_oov_rate
    FROM per_doc
    GROUP BY lang
    ORDER BY lang
    """,
)
def vocab_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-vocabulary rate per language against a top-50 corpus vocab.

    Two passes over one tokenized intermediate: (1) global top-K vocab
    (tiny — broadcast to the null-producing LEFT join), (2) per-doc OOV
    counts rolled up per language. At 100 TB the vocab stays KB-sized
    regardless of corpus size, so the join side never shuffles; the
    per-doc aggregate rides the tokenizer explode's natural partitioning."""
    d = table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", "lang", F.explode(F.split(F.col("text"), " ")).alias("token")
    )
    vocab = (
        tok.groupBy("token")
        .agg(F.count(F.lit(1)).alias("tf"))
        .orderBy(F.col("tf").desc(), F.col("token").asc())
        .limit(50)
        .select("token", F.lit(1).alias("in_vocab"))
    )
    per_doc = (
        tok.join(F.broadcast(vocab), "token", "left")
        .groupBy("doc_id", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.when(F.col("in_vocab").isNull(), 1).otherwise(0)).alias("n_oov"),
        )
    )
    return (
        per_doc.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg(F.col("n_oov").cast("double") / F.col("n_tokens")), 6).alias(
                "avg_oov_rate"
            ),
            F.round(
                F.sum(F.col("n_oov").cast("double")) / F.sum("n_tokens"), 6
            ).alias("corpus_oov_rate"),
        )
        .orderBy("lang")
    )


@query(
    "url_canonicalize_dedup",
    oracle="""
    WITH raw AS (
        SELECT doc_id,
               CASE WHEN doc_id % 2 = 0 THEN 'HTTPS' ELSE 'https' END
               || '://'
               || CASE WHEN doc_id % 3 = 0 THEN upper(source) || '.Example.com'
                       ELSE source || '.example.com' END
               || CASE WHEN doc_id % 4 = 0 THEN ':443' ELSE '' END
               || '/doc/' || CAST(doc_id // 10 AS VARCHAR)
               || '?'
               || CASE WHEN doc_id % 2 = 0 THEN 'utm_source=feed&b=2&a=1'
                       ELSE 'a=1&b=2' END
               || CASE WHEN doc_id % 5 = 0 THEN '#sec' ELSE '' END AS url
        FROM documents),
    parsed AS (
        SELECT doc_id,
               lower(regexp_extract(url, '^([A-Za-z]+)://', 1))   AS scheme,
               lower(regexp_extract(url, '://([^/:?#]+)', 1))     AS host,
               regexp_extract(url, '://[^/?#]*(/[^?#]*)', 1)      AS path,
               array_to_string(list_sort(list_filter(
                   string_split(regexp_extract(url, '\\?([^#]*)', 1), '&'),
                   p -> NOT starts_with(p, 'utm_'))), '&')        AS query
        FROM raw),
    canon AS (
        SELECT doc_id,
               scheme || '://' || host || path
               || CASE WHEN query <> '' THEN '?' || query ELSE '' END
                   AS canonical_url
        FROM parsed)
    SELECT canonical_url,
           COUNT(*)    AS n_raw,
           MIN(doc_id) AS keep_doc_id
    FROM canon
    GROUP BY canonical_url
    """,
)
def url_canonicalize_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization + dedup — the crawl-frontier/provenance step
    every web corpus runs before content dedup: lowercase scheme and
    host, strip the default port, drop tracking parameters (utm_*) and
    fragments, sort the surviving query parameters, then keep one
    document per canonical URL.

    The messy inputs are synthesized deterministically (case/port/
    tracking/fragment/param-order variants of the same logical URL, ~10
    docs per canonical path) since the corpus carries no URL column; the
    normalization chain — parse_url components, JVM-side array
    filter/sort over query params — is exactly what runs on a real
    crawl. Map-side until the single canonical-key aggregation."""
    d = table(spark, sf_dir, "documents")
    url = F.concat(
        F.when(F.col("doc_id") % 2 == 0, "HTTPS").otherwise("https"),
        F.lit("://"),
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(F.upper("source"), F.lit(".Example.com")),
        ).otherwise(F.concat(F.col("source"), F.lit(".example.com"))),
        F.when(F.col("doc_id") % 4 == 0, ":443").otherwise(""),
        F.lit("/doc/"),
        F.floor(F.col("doc_id") / 10).cast("string"),
        F.lit("?"),
        F.when(F.col("doc_id") % 2 == 0, "utm_source=feed&b=2&a=1").otherwise(
            "a=1&b=2"
        ),
        F.when(F.col("doc_id") % 5 == 0, "#sec").otherwise(""),
    )
    raw = d.select("doc_id", url.alias("url"))
    query_kept = F.array_join(
        F.array_sort(
            F.filter(
                F.split(F.coalesce(F.parse_url("url", F.lit("QUERY")), F.lit("")), "&"),
                lambda p: ~p.startswith("utm_") & (p != ""),
            )
        ),
        "&",
    )
    canon = raw.select(
        "doc_id",
        F.concat(
            F.lower(F.parse_url("url", F.lit("PROTOCOL"))),
            F.lit("://"),
            F.lower(F.parse_url("url", F.lit("HOST"))),
            F.parse_url("url", F.lit("PATH")),
            F.when(query_kept != "", F.concat(F.lit("?"), query_kept)).otherwise(""),
        ).alias("canonical_url"),
    )
    return canon.groupBy("canonical_url").agg(
        F.count(F.lit(1)).alias("n_raw"),
        F.min("doc_id").alias("keep_doc_id"),
    )


_HEAPS_BUCKET = 50  # docs per growth-curve point


@query(
    "vocab_growth_heaps",
    oracle=f"""
    WITH toks AS (
        SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS tok
        FROM documents),
    first_seen AS (
        SELECT tok, MIN(doc_id) AS first_doc FROM toks GROUP BY tok),
    per_bucket AS (
        SELECT CAST(first_doc // {_HEAPS_BUCKET} AS BIGINT) AS bucket_id,
               CAST(COUNT(*) AS BIGINT) AS new_tokens
        FROM first_seen GROUP BY 1)
    SELECT bucket_id,
           CAST((bucket_id + 1) * {_HEAPS_BUCKET} AS BIGINT) AS docs_through,
           new_tokens,
           CAST(SUM(new_tokens) OVER (ORDER BY bucket_id
                                      ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND CURRENT ROW) AS BIGINT) AS cum_vocab
    FROM per_bucket
    ORDER BY bucket_id
    """,
)
def vocab_growth_heaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary-growth (Heaps'-law) curve: distinct vocabulary size
    after each block of {_HEAPS_BUCKET} documents, from each token's
    FIRST occurrence. The curve's flattening rate is the standard
    corpus-health signal — a pile of near-duplicate crawl shards grows
    vocabulary far slower than fresh data, so this doubles as a cheap
    corpus-level dedup audit before any pairwise dedup runs.

    Plan: tokenize → per-doc distinct → one min-aggregate per token
    (the only data-sized shuffle), then the curve is a cumulative sum
    over the bucket-count frame. 'First occurrence' is a MIN over doc
    ids — order-free, no sequential scan of the corpus."""
    toks = (
        table(spark, sf_dir, "documents")
        .select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
        .distinct()
    )
    per_bucket = (
        toks.groupBy("tok")
        .agg(F.min("doc_id").alias("first_doc"))
        .groupBy(
            (F.col("first_doc") / _HEAPS_BUCKET)
            .cast("bigint")
            .alias("bucket_id")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("new_tokens"))
    )
    wcum = Window.partitionBy().orderBy("bucket_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return per_bucket.select(
        "bucket_id",
        ((F.col("bucket_id") + 1) * _HEAPS_BUCKET).cast("bigint").alias(
            "docs_through"
        ),
        "new_tokens",
        F.sum("new_tokens").over(wcum).cast("bigint").alias("cum_vocab"),
    ).orderBy("bucket_id")


_ZIPF_TOPK = 100


@query(
    "token_zipf_fit",
    oracle=f"""
    WITH cnt AS (
        SELECT tok, CAST(COUNT(*) AS DOUBLE) AS c
        FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
        GROUP BY tok),
    top AS (
        SELECT c, ROW_NUMBER() OVER (ORDER BY c DESC, tok ASC) AS r
        FROM cnt
        ORDER BY c DESC, tok ASC LIMIT {_ZIPF_TOPK}),
    pts AS (SELECT LN(CAST(r AS DOUBLE)) AS x, LN(c) AS y FROM top),
    sums AS (
        SELECT CAST(COUNT(*) AS DOUBLE) AS n,
               CAST(SUM(CAST(x AS DECIMAL(38,12))) AS DOUBLE) AS sx,
               CAST(SUM(CAST(y AS DECIMAL(38,12))) AS DOUBLE) AS sy,
               CAST(SUM(CAST(x * y AS DECIMAL(38,12))) AS DOUBLE) AS sxy,
               CAST(SUM(CAST(x * x AS DECIMAL(38,12))) AS DOUBLE) AS sxx,
               CAST(SUM(CAST(y * y AS DECIMAL(38,12))) AS DOUBLE) AS syy
        FROM pts)
    SELECT CAST(n AS BIGINT) AS n_points,
           ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS zipf_slope,
           ROUND((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 6)
               AS intercept,
           ROUND((n * sxy - sx * sy) * (n * sxy - sx * sy)
                 / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r2
    FROM sums
    """,
)
def token_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit of the corpus frequency spectrum: log-log OLS of
    frequency against rank for the top-{_ZIPF_TOPK} tokens. Natural text
    sits near slope -1 with high R²; a corpus whose spectrum bends away
    (template spam flattens it, aggressive dedup steepens it) fails the
    power-law sanity check — the companion diagnostic to
    `vocab_growth_heaps`' Heaps curve.

    One token-count aggregate (the only data-sized work), a
    TakeOrdered top-{_ZIPF_TOPK}, then the OLS closed form over 100
    points with every sum in DECIMAL — the fit itself costs nothing and
    cannot drift between engines."""
    cnt = (
        table(spark, sf_dir, "documents")
        .select(F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("double").alias("c"))
    )
    top = (
        cnt.orderBy(F.col("c").desc(), F.col("tok").asc())
        .limit(_ZIPF_TOPK)
        .select("c", F.col("tok").alias("tok"))
    )
    wr = Window.partitionBy().orderBy(F.col("c").desc(), F.col("tok").asc())
    pts = top.select(
        F.log(F.row_number().over(wr).cast("double")).alias("x"),
        F.log("c").alias("y"),
    )

    def dsum12(col):
        return F.sum(col.cast("decimal(38,12)")).cast("double")

    sums = pts.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        dsum12(F.col("x")).alias("sx"),
        dsum12(F.col("y")).alias("sy"),
        dsum12(F.col("x") * F.col("y")).alias("sxy"),
        dsum12(F.col("x") * F.col("x")).alias("sxx"),
        dsum12(F.col("y") * F.col("y")).alias("syy"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return sums.select(
        F.col("n").cast("bigint").alias("n_points"),
        F.round(slope, 6).alias("zipf_slope"),
        F.round((F.col("sy") - slope * F.col("sx")) / F.col("n"), 6).alias(
            "intercept"
        ),
        F.round(
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
            * (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
            / (
                (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
                * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
            ),
            6,
        ).alias("r2"),
    )


@query(
    "vocab_hapax_rate",
    oracle="""
    WITH tok AS (
        SELECT source, unnest(string_split(text, ' ')) AS w FROM documents),
    wc AS (SELECT source, w, COUNT(*) AS c FROM tok GROUP BY source, w)
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS vocab_size,
           CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
           ROUND(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 6)
               AS hapax_rate,
           CAST(SUM(c) AS BIGINT) AS n_tokens
    FROM wc GROUP BY source
    """,
)
def vocab_hapax_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hapax legomena rate per source: the share of vocabulary that
    occurs exactly once — the corpus-health probe that reads opposite
    to duplication (heavily templated/duplicated sources show LOW
    hapax rates; scraped junk with OCR noise shows pathologically HIGH
    ones). Complements the growth (vocab_growth_heaps) and spectrum
    (token_zipf_fit) views with a single-number screen.

    One (source, word) count + one per-source rollup — the same
    two-level aggregation shape as the Gopher gates, keyed to stay
    linear in corpus tokens."""
    tok = (
        table(spark, sf_dir, "documents")
        .repartition(spark.sparkContext.defaultParallelism, "doc_id")
        .select("source", F.explode(F.split("text", " ")).alias("w"))
    )
    wc = tok.groupBy("source", "w").agg(F.count(F.lit(1)).alias("c"))
    hapax = F.sum(F.when(F.col("c") == 1, 1).otherwise(0))
    return wc.groupBy("source").agg(
        F.count(F.lit(1)).alias("vocab_size"),
        hapax.cast("long").alias("n_hapax"),
        F.round(hapax * 1.0 / F.count(F.lit(1)), 6).alias("hapax_rate"),
        F.sum("c").cast("long").alias("n_tokens"),
    )
