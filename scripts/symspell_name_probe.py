"""Symspell realistic-name-distribution probe (round-5 verdict task 6).

The 20x probe for linkage_symspell_edit1 used the replica lake's
sequential-ID customer names ("Customer#000123456"), where candidate
pairs genuinely grow with the corpus — a worst case that says nothing
about whether the DELETE-KEY BUCKETS themselves go quadratic on real
name distributions. This probe builds skewed/clustered person-name
corpora (Zipf-weighted common given/surnames + deterministic typo
variants + numeric-suffix handles) at increasing scale and records the
pair-volume vs runtime curve plus the bucket-size tail:

    n_names, key_rows, max_bucket, p99_bucket,
    candidate_rows (pre-levenshtein), true_pairs, seconds

If max_bucket grows with corpus size, a df-cap with an exact add-back
certificate is warranted; if it stays alphabet-bounded, runtime is
linear in true candidate volume and the operator holds at 100 TB.

Usage: python scripts/symspell_name_probe.py [scale ...]  (default 1 4 16)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

from spark_streaming_practicum_spark.operators.dedup import (
    symspell_delete_keys,
    symspell_edit1_pairs,
)
from spark_streaming_practicum_spark.session import build_session

# Public top-frequency US given names / surnames (census-style lists,
# truncated); the probe needs a REALISTIC shape — heavy head, long tail
# of rare combinations — not the exact census weights.
GIVEN = (
    "james mary john patricia robert jennifer michael linda william barbara "
    "david susan richard jessica joseph sarah thomas karen charles nancy "
    "christopher lisa daniel margaret matthew betty anthony sandra mark ashley "
    "donald dorothy steven kimberly paul emily andrew donna joshua michelle "
    "kenneth carol kevin amanda brian melissa george deborah edward stephanie"
).split()
SUR = (
    "smith johnson williams brown jones garcia miller davis rodriguez martinez "
    "hernandez lopez gonzalez wilson anderson thomas taylor moore jackson martin "
    "lee perez thompson white harris sanchez clark ramirez lewis robinson "
    "walker young allen king wright scott torres nguyen hill flores green "
    "adams nelson baker hall rivera campbell mitchell carter roberts"
).split()


def build_names(spark, scale: int) -> DataFrame:
    """~scale * 60k distinct names: Zipf-ish head (common combos get
    numeric-suffix handles, like real usernames), plus edit-1 typo
    clusters around the head (deletion + substitution variants)."""
    g = spark.createDataFrame([(i, w) for i, w in enumerate(GIVEN)], "gi int, g string")
    s = spark.createDataFrame([(i, w) for i, w in enumerate(SUR)], "si int, s string")
    base = g.crossJoin(s).select(
        "gi", "si", F.concat_ws(" ", "g", "s").alias("full")
    )
    # Zipf-ish multiplicity: rank = gi + si, head combos get up to
    # `scale * 24` suffixed handles, tail combos 1-2.
    n_var = (F.lit(scale * 24) / (F.lit(1) + F.col("gi") + F.col("si"))).cast("int") + 1
    handles = base.select(
        F.explode(F.sequence(F.lit(0), n_var)).alias("v"), "full"
    ).select(
        F.when(F.col("v") == 0, F.col("full"))
        .otherwise(F.concat_ws("", F.col("full"), F.lit("."), F.col("v").cast("string")))
        .alias("t")
    )
    # Deterministic typo clusters: for every head name (v <= 2), one
    # deletion variant (drop char at hash-picked pos) and one
    # substitution variant (swap hash-picked char for 'x').
    # pmod, not %: xxhash64 is signed, and a negative modulo yielded
    # pos <= 0 for ~half the names, turning the "typo" into an empty
    # prefix instead of an edit-1 variant (round-6 advice).
    pos = (F.pmod(F.xxhash64("t"), F.length("t") - 2) + 2).cast("int")
    typos = handles.limit(scale * 3000).select(
        F.concat(
            F.substring(F.col("t"), F.lit(1), pos - 1), F.substr(F.col("t"), pos + 1)
        ).alias("t")
    ).union(
        handles.limit(scale * 3000).select(
            F.concat(
                F.substring(F.col("t"), F.lit(1), pos - 1),
                F.lit("x"),
                F.substr(F.col("t"), pos + 1),
            ).alias("t")
        )
    )
    return handles.union(typos).distinct()


def probe(spark, scale: int) -> dict:
    names = build_names(spark, scale).localCheckpoint(eager=True)
    n = names.count()
    keys = symspell_delete_keys(names)
    kstats = (
        keys.groupBy("k")
        .agg(F.count(F.lit(1)).alias("b"))
        .agg(
            F.sum("b").alias("key_rows"),
            F.max("b").alias("max_bucket"),
            F.expr("percentile_approx(b, 0.99)").alias("p99_bucket"),
            F.sum(F.col("b") * (F.col("b") - 1) / 2).alias("candidate_rows"),
        )
        .collect()[0]
    )
    t0 = time.perf_counter()
    true_pairs = symspell_edit1_pairs(names).count()
    sec = time.perf_counter() - t0
    return {
        "scale": scale,
        "n_names": n,
        "key_rows": int(kstats.key_rows),
        "max_bucket": int(kstats.max_bucket),
        "p99_bucket": int(kstats.p99_bucket),
        "candidate_rows": int(kstats.candidate_rows),
        "true_pairs": true_pairs,
        "seconds": round(sec, 2),
    }


def main() -> None:
    scales = [int(a) for a in sys.argv[1:]] or [1, 4, 16]
    spark = build_session(app_name="symspell-name-probe")
    rows = []
    for sc in scales:
        r = probe(spark, sc)
        rows.append(r)
        print(r, flush=True)
    # linearity summary: runtime ratio vs candidate-volume ratio
    if len(rows) >= 2:
        a, b = rows[0], rows[-1]
        print(
            f"scale x{b['scale'] // a['scale']}: names x{b['n_names'] / a['n_names']:.1f}, "
            f"candidates x{b['candidate_rows'] / max(a['candidate_rows'], 1):.1f}, "
            f"true pairs x{b['true_pairs'] / max(a['true_pairs'], 1):.1f}, "
            f"runtime x{b['seconds'] / max(a['seconds'], 0.01):.1f}, "
            f"max_bucket {a['max_bucket']} -> {b['max_bucket']}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
