"""Corpus balancing: temperature resampling and length-bucket batching.

Two pre-training data-mix primitives that sit between curation and
sharding in a large-scale pipeline:

1. **Temperature resampling** (multilingual up/down-weighting, the
   mBERT / XLM-R exponential-smoothing scheme): a language with token
   share p_l is sampled with probability q_l proportional to p_l^alpha
   (alpha < 1 lifts low-resource languages). The whole computation is
   one token-count aggregate over the corpus followed by arithmetic on
   L rows — at 100 TB the heavy part is the single scan; the smoothing
   itself is constant-size.
2. **Length-bucket batching stats** (the dynamic-batching planner):
   bucket documents by power-of-two token length, then report per
   bucket how many sequences, how much padding a [batch, cap] tensor
   would waste, and how many fixed-size batches result. Bucket
   assignment is a pure codegen'd CASE ladder on one derived column —
   no shuffle beyond the final per-bucket aggregate.

The reference has no training-prep surface (ingest-only,
/root/reference/README.md:58-72); these extend the north-star pipeline
over ``documents``. Both oracles use integer-exact bucket math and
round the float shares so the hashes are engine-portable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import query

ALPHA = 0.3
BATCH = 32

# power-of-two CASE ladder (integer-exact in both engines; float LOG2
# near integer boundaries is libm-dependent, so we never use it)
_BUCKET_SQL = """CASE WHEN tok_len <= 16 THEN 16 WHEN tok_len <= 32 THEN 32
    WHEN tok_len <= 64 THEN 64 WHEN tok_len <= 128 THEN 128
    WHEN tok_len <= 256 THEN 256 ELSE 512 END"""


@query(
    "lang_temperature_resample",
    oracle=f"""
    WITH per_lang AS (
        SELECT lang, CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS tok_count
        FROM documents GROUP BY lang
    ),
    p AS (
        SELECT lang, tok_count,
               CAST(tok_count AS DOUBLE) / SUM(tok_count) OVER () AS p_share
        FROM per_lang
    ),
    pq AS (
        SELECT lang, tok_count, p_share,
               POWER(p_share, {ALPHA}) / SUM(POWER(p_share, {ALPHA})) OVER () AS q_share
        FROM p
    )
    SELECT lang, tok_count,
           ROUND(p_share, 6) AS p_share,
           ROUND(q_share, 6) AS q_share,
           ROUND(q_share / p_share, 6) AS resample_factor
    FROM pq
    ORDER BY lang
    """,
)
def lang_temperature_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language sampling shares under temperature alpha=0.3.

    One corpus scan reduces to L rows (token count per language); the
    unpartitioned windows then run over those L rows only — the
    single-partition window is on constant-size data, never the corpus.
    resample_factor > 1 means the language is up-sampled."""
    toks = (
        table(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(F.sum(F.size(F.split(F.col("text"), " "))).alias("tok_count"))
    )
    w = Window.partitionBy()
    p = F.col("tok_count").cast("double") / F.sum("tok_count").over(w)
    shares = toks.withColumn("p_share", p).withColumn(
        "pa", F.pow(F.col("p_share"), F.lit(ALPHA))
    )
    q = F.col("pa") / F.sum("pa").over(w)
    return (
        shares.withColumn("q_share", q)
        .select(
            "lang",
            "tok_count",
            F.round("p_share", 6).alias("p_share"),
            F.round("q_share", 6).alias("q_share"),
            F.round(F.col("q_share") / F.col("p_share"), 6).alias("resample_factor"),
        )
        .orderBy("lang")
    )


@query(
    "length_bucket_batches",
    oracle=f"""
    WITH lens AS (
        SELECT len(string_split(text, ' ')) AS tok_len FROM documents
    ),
    bucketed AS (SELECT tok_len, {_BUCKET_SQL} AS bucket_cap FROM lens)
    SELECT bucket_cap,
           COUNT(*) AS n_docs,
           CAST(SUM(tok_len) AS BIGINT) AS total_tokens,
           CAST(SUM(bucket_cap - tok_len) AS BIGINT) AS padding_tokens,
           ROUND(CAST(SUM(bucket_cap - tok_len) AS DOUBLE)
                 / (COUNT(*) * bucket_cap), 6) AS waste_frac,
           CAST(CEIL(CAST(COUNT(*) AS DOUBLE) / {BATCH}) AS BIGINT) AS n_batches
    FROM bucketed
    GROUP BY bucket_cap
    ORDER BY bucket_cap
    """,
)
def length_bucket_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic-batching plan: power-of-two length buckets with padding
    waste and batch counts.

    The bucket id is an integer CASE ladder (no float log2 — libm
    rounding near powers of two differs across engines), evaluated
    inside whole-stage codegen; the only shuffle is the 6-ish-row
    bucket aggregate."""
    lens = table(spark, sf_dir, "documents").select(
        F.size(F.split(F.col("text"), " ")).alias("tok_len")
    )
    bucketed = lens.withColumn("bucket_cap", F.expr(_BUCKET_SQL))
    return (
        bucketed.groupBy("bucket_cap")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("tok_len").cast("bigint").alias("total_tokens"),
            F.sum(F.col("bucket_cap") - F.col("tok_len"))
            .cast("bigint")
            .alias("padding_tokens"),
            F.round(
                F.sum(F.col("bucket_cap") - F.col("tok_len")).cast("double")
                / (F.count(F.lit(1)) * F.first("bucket_cap")),
                6,
            ).alias("waste_frac"),
            F.ceil(F.count(F.lit(1)).cast("double") / F.lit(BATCH))
            .cast("bigint")
            .alias("n_batches"),
        )
        .orderBy("bucket_cap")
    )


def _diversity_select(dim: str) -> str:
    return f"""
        SELECT '{dim}' AS dimension,
               CAST(COUNT(*) AS BIGINT) AS n_categories,
               ROUND(1 - SUM(p * p), 6) AS simpson,
               ROUND(-SUM(p * LN(p)), 6) AS shannon,
               ROUND(EXP(-SUM(p * LN(p))), 6) AS effective_categories
        FROM (SELECT CAST(COUNT(*) AS DOUBLE)
                     / SUM(COUNT(*)) OVER () AS p
              FROM documents GROUP BY {dim})"""


@query(
    "corpus_diversity_indices",
    oracle=(
        _diversity_select("lang")
        + "\n    UNION ALL\n"
        + _diversity_select("source")
        + "\n    ORDER BY dimension"
    ),
)
def corpus_diversity_indices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-composition diversity along the lang and source axes:
    Simpson (1 - Σp²), Shannon entropy (nats), and the effective number
    of categories exp(H) — the single numbers a data-mixture report
    leads with ('this corpus behaves like N equally-sized sources').
    Collapsing diversity across snapshots flags a crawler or sampler
    gone monocultural before training feels it.

    One grouped count per axis (two-phase agg), shares via a window
    over the tiny category frame, then a constant-size reduction. The
    category shares are exact rationals, so the indices differ between
    engines only past the 6-dp rounding."""
    d = table(spark, sf_dir, "documents")

    def one(dim: str) -> DataFrame:
        cat = d.groupBy(dim).agg(F.count("*").alias("c"))
        p = (F.col("c").cast("double") / F.sum("c").over(Window.partitionBy())).alias("p")
        return cat.select(p).agg(
            F.lit(dim).alias("dimension"),
            F.count("*").cast("bigint").alias("n_categories"),
            F.round(1 - F.sum(F.col("p") * F.col("p")), 6).alias("simpson"),
            F.round(-F.sum(F.col("p") * F.log(F.col("p"))), 6).alias("shannon"),
            F.round(F.exp(-F.sum(F.col("p") * F.log(F.col("p")))), 6).alias(
                "effective_categories"
            ),
        )

    return one("lang").unionByName(one("source")).orderBy("dimension")


@query(
    "quantile_normalize_sources",
    oracle="""
    WITH ranked AS (
        SELECT source, n_chars,
               NTILE(20) OVER (PARTITION BY source
                               ORDER BY n_chars, doc_id) AS q
        FROM documents),
    target AS (
        SELECT q, CAST(SUM(CAST(n_chars AS DECIMAL(38,6))) AS DOUBLE)
                      / COUNT(*) AS pooled_mean
        FROM ranked GROUP BY q)
    SELECT r.source, r.q,
           COUNT(*) AS n,
           CAST(SUM(CAST(r.n_chars AS DECIMAL(38,6))) AS DOUBLE)
               / COUNT(*) AS source_mean,
           ROUND(MAX(t.pooled_mean), 6) AS normalized_value
    FROM ranked r JOIN target t USING (q)
    GROUP BY r.source, r.q
    ORDER BY r.source, r.q
    """,
)
def quantile_normalize_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile normalization across corpus sources (the bioinformatics
    batch-effect correction, applied to data mixing): every source's
    doc-length distribution is mapped onto the POOLED distribution —
    ventile v of any source gets the pooled ventile mean — so
    length-driven sampling bias can't leak a source signal into the
    mix.

    Per-source ventiles are windows PARTITIONED by source (each source
    shuffles independently — not a global sort); the 20-row pooled
    profile broadcasts back. Means are exact-decimal SUM cast to double
    then divided by the count — NOT AVG: Spark's AVG(DECIMAL(38,6))
    returns DECIMAL(38,10) (10 dp) while DuckDB's AVG returns full-
    precision DOUBLE, a divergence invisible until a mean with
    repeating digits appeared in the round-8 sf0.1 sweep. The sum/count
    form is engine-identical (exact sum, nearest-double cast, one IEEE
    division). Output: the per-(source, ventile) mapping table, which
    at serving time is a broadcast lookup applied map-side."""
    d = table(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    w = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    ranked = d.select(
        "source", "n_chars", F.ntile(20).over(w).alias("q")
    )
    dmean = F.sum(F.col("n_chars").cast("decimal(38,6)")).cast("double") / F.count(
        F.lit(1)
    )
    target = ranked.groupBy("q").agg(dmean.alias("pooled_mean"))
    return (
        ranked.join(F.broadcast(target), "q")
        .groupBy("source", "q")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dmean.alias("source_mean"),
            F.round(F.max("pooled_mean"), 6).alias("normalized_value"),
        )
        .select("source", "q", "n", "source_mean", "normalized_value")
        .orderBy("source", "q")
    )


@query(
    "negative_sampling_unigram",
    oracle="""
    WITH tok AS (
        SELECT unnest(string_split(text, ' ')) AS w FROM documents),
    cnt AS (SELECT w, COUNT(*) AS n FROM tok GROUP BY w),
    top AS (SELECT w, n FROM cnt ORDER BY n DESC, w ASC LIMIT 50),
    pw AS (SELECT w, n, POWER(n, 0.75) AS u FROM top),
    tot AS (SELECT SUM(u) AS z FROM pw)
    SELECT p.w AS token, p.n,
           ROUND(p.u / t.z, 6) AS sample_prob,
           ROUND(SUM(p.u) OVER (ORDER BY p.u / t.z DESC, p.w ASC) / t.z, 6)
               AS cum_prob
    FROM pw p, tot t
    ORDER BY sample_prob DESC, token
    """,
)
def negative_sampling_unigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """word2vec negative-sampling table: unigram counts raised to the
    3/4 power and normalized (Mikolov's smoothing — rare words get
    boosted, stopwords damped), with the cumulative distribution that a
    sampler inverts. The vocabulary reduces to the top-50 head; the
    window runs on that 50-row frame, and at serving time the table is
    a broadcast binary-search lookup — the constant-size artifact a
    100 TB corpus compiles down to for contrastive training."""
    tok = (
        table(spark, sf_dir, "documents")
        .repartition(spark.sparkContext.defaultParallelism, "doc_id")
        .select(F.explode(F.split("text", " ")).alias("w"))
    )
    cnt = tok.groupBy("w").agg(F.count(F.lit(1)).alias("n"))
    top = cnt.orderBy(F.col("n").desc(), F.col("w").asc()).limit(50)
    pw = top.select("w", "n", F.pow("n", 0.75).alias("u"))
    tot = pw.agg(F.sum("u").alias("z"))
    prob = F.col("u") / F.col("z")
    w = (
        Window.orderBy(prob.desc(), F.col("w").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        pw.crossJoin(F.broadcast(tot))
        .select(
            F.col("w").alias("token"),
            "n",
            F.round(prob, 6).alias("sample_prob"),
            F.round(F.sum("u").over(w) / F.col("z"), 6).alias("cum_prob"),
        )
        .orderBy(F.col("sample_prob").desc(), "token")
    )


# --- DoReMi one-step domain reweighting --------------------------------------

_DOREMI_ETA = 1.0


@query(
    "doremi_domain_reweight_step",
    oracle="""
    WITH tok AS (
        SELECT lang, unnest(string_split(text, ' ')) AS w
        FROM documents),
    dt AS (SELECT lang, w, CAST(COUNT(*) AS DOUBLE) AS c
           FROM tok GROUP BY lang, w),
    dl AS (SELECT lang, SUM(c) AS cd FROM dt GROUP BY lang),
    gt AS (SELECT w, SUM(c) AS cg FROM dt GROUP BY w),
    tot AS (SELECT SUM(cd) AS ct FROM dl),
    ce AS (
        SELECT d.lang,
               -SUM(d.c * LN(g.cg / t.ct)) / MAX(l.cd) AS ce_proxy,
               -SUM(d.c * LN(d.c / l.cd)) / MAX(l.cd) AS ce_ref
        FROM dt d
        JOIN gt g USING (w)
        JOIN dl l USING (lang)
        CROSS JOIN tot t
        GROUP BY d.lang),
    upd AS (
        SELECT c.lang, l.cd, c.ce_proxy, c.ce_ref,
               (l.cd / t.ct) * EXP(1.0 * (c.ce_proxy - c.ce_ref)) AS w_raw
        FROM ce c JOIN dl l USING (lang) CROSS JOIN tot t),
    z AS (SELECT SUM(w_raw) AS z FROM upd)
    SELECT u.lang,
           CAST(u.cd AS BIGINT) AS n_tokens,
           ROUND(u.ce_proxy, 6) AS ce_proxy,
           ROUND(u.ce_ref, 6) AS ce_ref,
           ROUND(u.ce_proxy - u.ce_ref, 6) AS excess_loss,
           ROUND(u.w_raw / z.z, 6) AS weight_new
    FROM upd u CROSS JOIN z
    ORDER BY u.lang
    """,
)
def doremi_domain_reweight_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One DoReMi (Xie et al. 2023) domain-reweighting step over the
    per-language corpus slices: excess loss per domain = cross-entropy
    of the domain under the MIXTURE-trained proxy model minus under its
    own in-domain reference model, and the mixture weights move by the
    exponentiated-gradient rule w ∝ w_init * exp(eta * excess), then
    normalize. Unigram LMs stand in for the proxy/reference pair, which
    keeps the update exactly computable in both engines and preserves
    the structural guarantee the real method relies on: excess loss
    >= 0 (Gibbs' inequality — cross-entropy under the mixture model can
    never beat the in-domain model), so upweighting tracks genuine
    domain mismatch.

    Scale shape: the only corpus-sized operation is the (lang, token)
    count — partial-aggregated map-side before its one shuffle. The
    global token marginal derives FROM that aggregate (vocab-sized, no
    second corpus scan), and every join after it runs on vocab x domain
    rows. At 100 TB the job is one scan + one combine-heavy shuffle;
    the update itself is arithmetic on a domain-count-sized frame."""
    tok = table(spark, sf_dir, "documents").select(
        "lang", F.explode(F.split("text", " ")).alias("w")
    )
    dt = tok.groupBy("lang", "w").agg(F.count(F.lit(1)).cast("double").alias("c"))
    dl = dt.groupBy("lang").agg(F.sum("c").alias("cd"))
    gt = dt.groupBy("w").agg(F.sum("c").alias("cg"))
    tot = dl.agg(F.sum("cd").alias("ct"))
    ce = (
        dt.join(F.broadcast(gt), "w")
        .join(F.broadcast(dl), "lang")
        .crossJoin(F.broadcast(tot))
        .groupBy("lang")
        .agg(
            (-F.sum(F.col("c") * F.log(F.col("cg") / F.col("ct"))) / F.max("cd")).alias(
                "ce_proxy"
            ),
            (-F.sum(F.col("c") * F.log(F.col("c") / F.col("cd"))) / F.max("cd")).alias(
                "ce_ref"
            ),
        )
    )
    upd = (
        ce.join(F.broadcast(dl), "lang")
        .crossJoin(F.broadcast(tot))
        .select(
            "lang",
            "cd",
            "ce_proxy",
            "ce_ref",
            (
                (F.col("cd") / F.col("ct"))
                * F.exp(_DOREMI_ETA * (F.col("ce_proxy") - F.col("ce_ref")))
            ).alias("w_raw"),
        )
    )
    z = upd.agg(F.sum("w_raw").alias("z"))
    return (
        upd.crossJoin(F.broadcast(z))
        .select(
            "lang",
            F.col("cd").cast("bigint").alias("n_tokens"),
            F.round("ce_proxy", 6).alias("ce_proxy"),
            F.round("ce_ref", 6).alias("ce_ref"),
            F.round(F.col("ce_proxy") - F.col("ce_ref"), 6).alias("excess_loss"),
            F.round(F.col("w_raw") / F.col("z"), 6).alias("weight_new"),
        )
        .orderBy("lang")
    )
