"""Round-12 probe: lazy single-shuffle global_row_number candidate.

Checks that
    repartitionByRange(P, keys) -> sortWithinPartitions(keys)
    -> local index from monotonically_increasing_id
    -> offsets from a per-_pid count cumsum (32-row window, broadcast)
produces the EXACT same (key -> global_rn) map as the shipped
persist+collect two-pass helper, and counts jobs/exchanges for both.
"""

from __future__ import annotations

import io
import contextlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from spark_streaming_practicum_spark.functions.ranks import (
    global_row_number,
    release_persisted_frames,
)
from spark_streaming_practicum_spark.session import build_session
from spark_streaming_practicum_spark.catalog import table


def lazy_grn(df: DataFrame, order_exprs, rn_name="global_rn", partitions=None):
    spark = df.sparkSession
    P = partitions or spark.sparkContext.defaultParallelism
    d = (
        df.repartitionByRange(P, *order_exprs)
        .sortWithinPartitions(*order_exprs)
        .select(
            "*",
            F.spark_partition_id().alias("_pid"),
            F.monotonically_increasing_id().alias("_mid"),
        )
    )
    cnt = d.groupBy("_pid").agg(F.count(F.lit(1)).alias("_n"))
    woff = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    off = cnt.select(
        "_pid",
        F.coalesce(F.sum("_n").over(woff), F.lit(0)).cast("long").alias("_off"),
    )
    local = (F.col("_mid") - F.col("_pid").cast("long") * F.lit(1 << 33).cast("long") + 1)
    return (
        d.join(F.broadcast(off), "_pid")
        .withColumn(rn_name, (F.col("_off") + local).cast("long"))
        .drop("_pid", "_mid", "_off")
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = build_session(app_name="rank-lazy-probe")
    sc = spark.sparkContext
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", F.col("l_extendedprice").alias("y")
    )
    order = [F.col("y").asc(), F.col("l_orderkey").asc(), F.col("l_linenumber").asc()]

    old, n_old = global_row_number(li, order, rn_name="rn")
    old_rows = {(r["l_orderkey"], r["l_linenumber"]): r["rn"] for r in old.collect()}
    release_persisted_frames()

    new = lazy_grn(li, order, rn_name="rn")
    new_rows = {(r["l_orderkey"], r["l_linenumber"]): r["rn"] for r in new.collect()}

    same = old_rows == new_rows
    print(f"rows={len(old_rows)} n_old={n_old} identical={same}")
    if not same:
        diffs = [(k, old_rows[k], new_rows.get(k)) for k in old_rows if old_rows[k] != new_rows.get(k)]
        print("first diffs:", diffs[:10])
        sys.exit(1)

    # job-count + wall comparison (noop-style materialization via count of a
    # downstream aggregate so both plans fully execute)
    for label, builder in (
        ("old", lambda: global_row_number(li, order, rn_name="rn")[0]),
        ("new", lambda: lazy_grn(li, order, rn_name="rn")),
    ):
        for run in range(3):
            sc.setJobGroup(f"{label}{run}", label)
            t0 = time.perf_counter()
            out = builder()
            out.write.mode("overwrite").format("noop").save()
            dt = time.perf_counter() - t0
            jobs = len(sc.statusTracker().getJobIdsForGroup(f"{label}{run}"))
            spark.catalog.clearCache()
            release_persisted_frames()
            print(f"{label} run{run}: {dt:.3f}s jobs={jobs}")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        lazy_grn(li, order, rn_name="rn").explain("formatted")
    plan = buf.getvalue()
    import re

    print("new plan census: Exchange=", len(re.findall(r"\bExchange\b", plan)),
          "Reused=", len(re.findall(r"ReusedExchange", plan)))
    spark.stop()


if __name__ == "__main__":
    main()
