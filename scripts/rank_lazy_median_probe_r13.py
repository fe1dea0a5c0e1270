"""Round-13 A/B (r12 verdict task 5): eager vs lazy median inside
robust_theil_sen_slope.

EAGER (shipped): median_by_rank collects per-partition counts to compute
the two middle ranks in Python (a blocking collect per median, 2 per
query) and stamps n_pairs as a literal.

LAZY (candidate): keep the counts in the DAG — offsets from a window
over the <=P-row count frame, target ranks as column expressions from a
cross-joined total — so the two median collects disappear. Rebuilt here
because the round-13 localCheckpoint truncation shrank the offset
subtree consumers re-plan, which was the r12 rejection reason.

Usage: python scripts/rank_lazy_median_probe_r13.py [ROUNDS]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from spark_streaming_practicum_spark.catalog import table
from spark_streaming_practicum_spark.functions.ranks import (
    _with_local_rank,
    global_row_number,
    release_persisted_frames,
)
from spark_streaming_practicum_spark.registry import all_queries
from spark_streaming_practicum_spark.session import build_session

from spark_streaming_practicum_spark.operators.analytics import (  # noqa: E402
    _TS_LAGS,
    _TS_SAMPLE_PCT,
)


def lazy_theil_sen(spark, sf_dir):
    key_mix = (
        F.col("l_orderkey").cast("bigint") * F.lit(2654435761).cast("bigint")
        + F.col("l_linenumber").cast("bigint") * 40503
    )
    pts = (
        table(spark, sf_dir, "lineitem")
        .filter(F.pmod(key_mix, F.lit(100)) < _TS_SAMPLE_PCT)
        .select(
            F.col("l_quantity").cast("double").alias("x"),
            F.col("l_extendedprice").cast("double").alias("y"),
            "l_orderkey",
            "l_linenumber",
        )
    )
    rk, _n = global_row_number(
        pts,
        [F.col("x").asc(), F.col("l_orderkey").asc(), F.col("l_linenumber").asc()],
        rn_name="rn",
    )
    rk = rk.select("x", "y", "rn").localCheckpoint(eager=False)
    a = rk.select(
        F.col("rn").alias("rna"), F.col("x").alias("xa"), F.col("y").alias("ya")
    )
    pairs = None
    for lag in _TS_LAGS:
        b = rk.select(
            (F.col("rn") - lag).alias("rna"),
            F.col("x").alias("xb"),
            F.col("y").alias("yb"),
        )
        p = a.join(b, "rna").filter(F.col("xb") != F.col("xa"))
        pairs = p if pairs is None else pairs.unionByName(p)
    slopes = pairs.select(
        ((F.col("yb") - F.col("ya")) / (F.col("xb") - F.col("xa"))).alias("s")
    ).localCheckpoint(eager=False)

    def lazy_median(df, col):
        P = df.sparkSession.sparkContext.defaultParallelism
        d = _with_local_rank(df, [F.col(col).asc()], P).localCheckpoint(eager=False)
        cnt = d.groupBy("_pid").agg(F.count(F.lit(1)).alias("_n"))
        w = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
        off = cnt.select(
            "_pid", F.coalesce(F.sum("_n").over(w), F.lit(0)).alias("_off")
        )
        tot = cnt.agg(F.sum("_n").alias("_tot"))
        med = (
            d.join(F.broadcast(off), "_pid")
            .withColumn("_grn", F.col("_off") + F.col("_lrn"))
            .crossJoin(F.broadcast(tot))
            .filter(
                (F.col("_grn") == F.floor((F.col("_tot") + 1) / 2))
                | (F.col("_grn") == F.floor(F.col("_tot") / 2) + 1)
            )
            .agg(F.avg(col).alias("med"))
        )
        return med, tot

    m, tot_s = lazy_median(slopes, "s")
    resid = rk.crossJoin(F.broadcast(m)).select(
        (F.col("y") - F.col("med") * F.col("x")).alias("r")
    )
    icpt, _ = lazy_median(resid, "r")
    return (
        m.select(F.col("med").alias("slope"))
        .crossJoin(F.broadcast(icpt.select(F.col("med").alias("intercept"))))
        .crossJoin(F.broadcast(tot_s))
        .select(
            F.col("_tot").cast("bigint").alias("n_pairs"),
            F.round("slope", 6).alias("slope_median"),
            F.round("intercept", 6).alias("intercept_median"),
        )
    )


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = build_session(app_name="lazy-median-ab")
    sc = spark.sparkContext
    eager_fn = all_queries()["robust_theil_sen_slope"].fn

    # value-equality gate first (sf0.01 + sf0.1)
    for vsf in ("/root/testdata/sf0.01", sf):
        ev = [tuple(r) for r in eager_fn(spark, vsf).collect()]
        lv = [tuple(r) for r in lazy_theil_sen(spark, vsf).collect()]
        print(f"equal@{vsf}: {ev == lv}  eager={ev} lazy={lv}", flush=True)
        release_persisted_frames()
        spark.catalog.clearCache()

    res = {"eager": [], "lazy": []}
    jobs = {"eager": None, "lazy": None}
    for r in range(rounds):
        for tag, fn in (("eager", eager_fn), ("lazy", lazy_theil_sen)):
            grp = f"ts-{tag}-{r}"
            sc.setJobGroup(grp, grp)
            t0 = time.perf_counter()
            fn(spark, sf).write.mode("overwrite").format("noop").save()
            res[tag].append(round(time.perf_counter() - t0, 3))
            jobs[tag] = len(sc.statusTracker().getJobIdsForGroup(grp))
            release_persisted_frames()
            spark.catalog.clearCache()
    print(json.dumps({"runs": res, "jobs": jobs,
                      "min": {k: min(v) for k, v in res.items()},
                      "median": {k: sorted(v)[len(v)//2] for k, v in res.items()}}))
    spark.stop()


if __name__ == "__main__":
    main()
