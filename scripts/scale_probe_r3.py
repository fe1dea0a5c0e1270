"""Round-3 20x scale probe.

Replicates the sf0.1 tables 20x into a temp lake (keys shifted per
replica so group/key structure scales the way real growth would:
20x groups of the same size for user-keyed ops, 20x vocabulary for
text ops, 20x rows per ranking group for the rank ops) and times this
round's operators cold (fresh temp dir, caches cleared, noop sink).

Usage: python scripts/scale_probe_r3.py [REPL]   (default 20)
Prints one line per query: name, 1x seconds, REPLx seconds, ratio.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from spark_streaming_practicum_spark.catalog import table
from spark_streaming_practicum_spark.registry import all_queries
from spark_streaming_practicum_spark.session import build_session

SF = "/root/testdata/sf0.1"
# Parsed at import time (later probes import this module and read REPL);
# non-numeric argv[1] means the caller passed query names only — default 20.
REPL = (
    int(sys.argv[1])
    if len(sys.argv) > 1 and sys.argv[1].isdigit() and int(sys.argv[1]) > 0
    else 20
)

QUERIES = [
    "xicor_correlation",
    "grpo_group_advantage",
    "bradley_terry_one_step",
    "curriculum_perplexity_stages",
    "ngram_draft_acceptance_rate",
    "intra_doc_segment_dedup",
    "crosslingual_margin_mining",
    "benjamini_hochberg_fdr",
    "propensity_strata_att",
    "mann_kendall_trend",
    "cramers_v_matrix",
    "dedup_minhash_lsh",
]


def build_lake(spark, out: str) -> None:
    r = F.explode(F.sequence(F.lit(0), F.lit(REPL - 1))).alias("rep")

    def rep(df):
        return df.select("*", r)

    big = 10_000_000
    # lineitem: shift the order key so replicas are disjoint orders
    li = rep(table(spark, SF, "lineitem")).withColumn(
        "l_orderkey", F.col("l_orderkey") + F.col("rep") * big
    ).drop("rep")
    li.write.mode("overwrite").parquet(f"{out}/lineitem.parquet")
    # orders: same shift (keeps FK sane); dates untouched so the
    # monthly frame keeps its 80 periods at 20x the rows behind each
    o = rep(table(spark, SF, "orders")).withColumn(
        "o_orderkey", F.col("o_orderkey") + F.col("rep") * big
    ).drop("rep")
    o.write.mode("overwrite").parquet(f"{out}/orders.parquet")
    # events: shift user + event ids -> 20x prompt groups of equal size
    e = (
        rep(table(spark, SF, "events"))
        .withColumn("user_id", F.col("user_id") + F.col("rep") * big)
        .withColumn("event_id", F.col("event_id") + F.col("rep") * big)
        .drop("rep")
    )
    e.write.mode("overwrite").parquet(f"{out}/events.parquet")
    # documents: disjoint per-replica vocabulary (prefix every word) so
    # bigram models / shingle indexes grow 20x instead of densifying
    d = (
        rep(table(spark, SF, "documents"))
        .withColumn("doc_id", F.col("doc_id") + F.col("rep") * big)
        .withColumn(
            "text",
            F.array_join(
                F.transform(
                    F.split("text", " "),
                    lambda w: F.concat(F.col("rep").cast("string"), F.lit("_"), w),
                ),
                " ",
            ),
        )
        .drop("rep")
    )
    d.write.mode("overwrite").parquet(f"{out}/documents.parquet")
    # embeddings: disjoint vec ids; labels untouched (20x slice sizes)
    em = (
        rep(table(spark, SF, "embeddings"))
        .withColumn("vec_id", F.col("vec_id") + F.col("rep") * big)
        .drop("rep")
    )
    em.write.mode("overwrite").parquet(f"{out}/embeddings.parquet")
    for t in ("part", "customer", "supplier", "nation", "region"):
        table(spark, SF, t).write.mode("overwrite").parquet(f"{out}/{t}.parquet")


def main() -> None:
    spark = build_session(app_name="scale-probe-r3")
    defs = all_queries()
    out = tempfile.mkdtemp(prefix="ssp_probe_")
    try:
        build_lake(spark, out)
        print(f"lake built at {out} (x{REPL})")
        for name in QUERIES:
            times = {}
            for label, sf_dir in (("1x", SF), (f"{REPL}x", out)):
                t0 = time.perf_counter()
                defs[name].fn(spark, sf_dir).write.mode("overwrite").format(
                    "noop"
                ).save()
                times[label] = time.perf_counter() - t0
                spark.catalog.clearCache()
            r = times[f"{REPL}x"] / times["1x"]
            print(
                f"{name:32s} 1x={times['1x']:6.2f}s {REPL}x={times[f'{REPL}x']:7.2f}s"
                f"  ratio={r:5.1f}"
            )
    finally:
        shutil.rmtree(out, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    # The lenient module-level parse exists for importers; when run
    # directly, a malformed REPL must error, not silently become 20.
    if len(sys.argv) > 1 and not (sys.argv[1].isdigit() and int(sys.argv[1]) > 0):
        sys.exit(f"usage: {sys.argv[0]} [REPL] — REPL must be a positive integer")
    main()
