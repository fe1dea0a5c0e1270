"""Hot-shingle (boilerplate) probe for the bounded dedup certificate.

The 20x replica lake gives each replica a DISJOINT vocabulary, so its
shingle buckets never grow and the exhaustive exact-Jaccard join looks
harmless there. Real web text is the opposite: boilerplate sentences
put the SAME shingle in millions of documents, and an uncapped
inverted-index join emits k^2 rows per hot shingle. This probe builds
that corpus shape synthetically and times the round-3 certificate form
(exhaustive, uncapped) against the round-4 form (doc_id % 4 endpoint
subsample + JACCARD_DF_CAP hot-shingle guard with exact add-back),
verifying both return identical pairs on the sampled slice.

Usage: python scripts/boilerplate_cap_probe.py [N_DOCS]   (default 6000)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from spark_streaming_practicum_spark.functions.textfns import shingles, tokens
from spark_streaming_practicum_spark.operators.dedup import (
    CERT_SAMPLE_MOD,
    JACCARD_DF_CAP,
    _jaccard_pairs,
)
from spark_streaming_practicum_spark.session import build_session

N = int(sys.argv[1]) if len(sys.argv) > 1 else 6000


def build_corpus(spark):
    """Every doc: an 8-word boilerplate header (shared by ALL docs —
    hot shingles with df = N) + 24 doc-unique words. Every 10th doc is
    a near-duplicate of its predecessor (unique words shared except
    one), so true Jaccard>=0.8 pairs exist and ride COLD shingles."""
    boiler = "terms of service all rights reserved contact"
    d = spark.range(N).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit(boiler + " "),
            # near-dup pairs: docs 10j and 10j+1 share the same 24-word
            # body except the last word
            F.array_join(
                F.transform(
                    F.sequence(F.lit(0), F.lit(23)),
                    lambda i: F.concat_ws(
                        "w",
                        F.lit("u"),
                        ((F.col("id") - (F.col("id") % 10 == 1).cast("long")) / 1)
                        .cast("long")
                        .cast("string"),
                        i.cast("string"),
                    ),
                ),
                " ",
            ),
            F.when(F.col("id") % 10 == 1, F.lit(" tail")).otherwise(F.lit("")),
        ).alias("text"),
    )
    sh = d.select(
        "doc_id",
        F.explode(F.array_distinct(shingles(tokens("text"), 3))).alias("shingle"),
    ).persist()
    sh.count()
    return sh


def main() -> None:
    spark = build_session(app_name="boilerplate-cap-probe")
    sh = build_corpus(spark)
    hot = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df")).filter(
        F.col("df") > JACCARD_DF_CAP
    )
    print(f"corpus: {N} docs; hot shingles (df > {JACCARD_DF_CAP}): {hot.count()}")

    t0 = time.perf_counter()
    bounded = _jaccard_pairs(
        sh, 0.8, join_df_cap=JACCARD_DF_CAP, sample_mod=CERT_SAMPLE_MOD
    )
    nb = bounded.count()
    t_bounded = time.perf_counter() - t0
    print(f"bounded certificate leg (r4): {nb} pairs in {t_bounded:6.2f}s")

    t0 = time.perf_counter()
    exhaustive = _jaccard_pairs(sh, 0.8)
    ne = exhaustive.count()
    t_full = time.perf_counter() - t0
    print(f"exhaustive exact leg (r3 form): {ne} pairs in {t_full:6.2f}s")

    in_sample = (F.col("doc_a") % CERT_SAMPLE_MOD == 0) | (
        F.col("doc_b") % CERT_SAMPLE_MOD == 0
    )
    sliced = exhaustive.filter(in_sample)
    mismatch = (
        sliced.join(bounded, ["doc_a", "doc_b", "jaccard"], "left_anti").count()
        + bounded.join(sliced, ["doc_a", "doc_b", "jaccard"], "left_anti").count()
    )
    print(
        f"slice equality: {'OK' if mismatch == 0 else f'{mismatch} MISMATCHED'}; "
        f"speedup {t_full / t_bounded:5.1f}x"
    )
    spark.stop()


if __name__ == "__main__":
    main()
