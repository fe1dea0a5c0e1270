"""Cluster-scale runtime features: dynamic partition pruning on a
day-partitioned lake table, and the RocksDB state store for streaming
state that outgrows executor heaps.

Both are pure-conf Spark capabilities — no extra JARs — but they are
exactly what changes at 100 TB: DPP turns a dim filter into a
planning-time partition skip on the fact scan, and RocksDB keeps
per-key streaming state on local disk (snapshotted to the checkpoint)
instead of the JVM heap.
"""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from spark_streaming_practicum_spark.catalog import stream_table, table
from spark_streaming_practicum_spark.plans import formatted_plan
from spark_streaming_practicum_spark.streaming.sinks import ParquetSink

from .conftest import SF_DIR


def test_dynamic_partition_pruning_from_filtered_dim(spark, tmp_path):
    """Joining a day-partitioned fact on its partition column against a
    selectively-filtered dim must inject a dynamicpruning expression
    into the fact scan's PartitionFilters — the fact table's untouched
    days are skipped at planning time, not read-and-dropped."""
    out = str(tmp_path / "fact")
    events = table(spark, SF_DIR, "events").withColumn("event_date", F.to_date("ts"))
    ParquetSink(out, partition_columns=("event_date",)).write(events)

    dim = events.select("event_date").distinct().withColumn(
        "is_audit_day", F.dayofmonth("event_date") <= 2
    )
    fact = spark.read.parquet(out)
    j = fact.join(
        dim.filter(F.col("is_audit_day")),
        "event_date",
    ).groupBy("event_date").agg(F.count("*").alias("n"))
    plan = formatted_plan(j)
    assert "dynamicpruning" in plan.lower(), plan[:4000]

    audit_days = {r["event_date"] for r in dim.filter("is_audit_day").collect()}
    got = {r["event_date"]: r["n"] for r in j.collect()}
    assert set(got) == audit_days
    want = {
        r["event_date"]: r["n"]
        for r in events.groupBy("event_date").agg(F.count("*").alias("n")).collect()
        if r["event_date"] in audit_days
    }
    assert got == want


def test_rocksdb_state_store_stateful_agg(spark, tmp_path):
    """Stateful streaming aggregation with the RocksDB state store
    provider: results must match the batch aggregate, and the
    checkpoint must hold RocksDB zip snapshots (proof the provider —
    not the default in-heap HDFS-backed one — actually ran)."""
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    ck = str(tmp_path / "ckpt")
    try:
        s = (
            stream_table(spark, SF_DIR, "events")
            .groupBy("event_type")
            .agg(F.count("*").alias("n"))
        )
        q = (
            s.writeStream.format("memory")
            .queryName("rocksdb_counts")
            .outputMode("complete")
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        got = {
            r["event_type"]: r["n"]
            for r in spark.sql("SELECT * FROM rocksdb_counts").collect()
        }
        want = {
            r["event_type"]: r["n"]
            for r in table(spark, SF_DIR, "events")
            .groupBy("event_type")
            .agg(F.count("*").alias("n"))
            .collect()
        }
        assert got == want
        snapshots = glob.glob(ck + "/state/**/*.zip", recursive=True)
        assert snapshots, "no RocksDB snapshot files under the checkpoint"
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)


def test_rocksdb_restart_large_state_million_keys(spark, tmp_path):
    """Restart survival at realistic state size: ~10^6 distinct keys of
    streaming aggregate state, held in RocksDB, across a stop/restart
    with NEW data arriving in between.

    Run 1 ingests 1M keys (counts of 2 each); more files land; run 2 —
    a fresh query on the same checkpoint — processes ONLY the new data
    yet its complete-mode output carries correct totals for every one
    of the 1M keys. That is possible only if the full state survived
    the restart through RocksDB snapshot recovery, which is the 100 TB
    streaming-state story end-to-end (heap-backed state at this
    cardinality per partition is what RocksDB exists to replace). The
    checkpoint must contain RocksDB .zip snapshots, and run 2's input
    cardinality is asserted from query progress so the test cannot
    silently pass by reprocessing everything."""
    n_keys = 1_000_000
    src = str(tmp_path / "src")
    ck = str(tmp_path / "ckpt")
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        # batch A: every key twice
        spark.range(2 * n_keys).select(
            (F.col("id") % n_keys).alias("k")
        ).write.mode("append").parquet(src)

        def run_once(sink_name: str):
            q = (
                spark.readStream.schema("k bigint")
                .parquet(src)
                .groupBy("k")
                .agg(F.count(F.lit(1)).alias("n"))
                .writeStream.format("memory")
                .queryName(sink_name)
                .outputMode("complete")
                .option("checkpointLocation", ck)
                .trigger(availableNow=True)
                .start()
            )
            assert q.awaitTermination(600), "stream did not drain in 600s"
            progress = q.recentProgress
            return sum(p["numInputRows"] for p in progress)

        rows1 = run_once("rocks_m1")
        assert rows1 == 2 * n_keys

        # batch B lands while the query is down: keys 0..999 once more
        spark.range(1000).select(F.col("id").alias("k")).write.mode(
            "append"
        ).parquet(src)

        rows2 = run_once("rocks_m2")
        assert rows2 == 1000  # ONLY the new file — no reprocessing

        out = spark.sql(
            "SELECT sum(n) AS total, count(*) AS keys, "
            "sum(CASE WHEN n = 3 THEN 1 ELSE 0 END) AS bumped "
            "FROM rocks_m2"
        ).first()
        assert out["keys"] == n_keys
        assert out["total"] == 2 * n_keys + 1000
        assert out["bumped"] == 1000

        snapshots = glob.glob(ck + "/state/**/*.zip", recursive=True)
        assert snapshots, "no RocksDB snapshot files under the checkpoint"
    finally:
        spark.catalog.dropTempView("rocks_m1")
        spark.catalog.dropTempView("rocks_m2")
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)


def test_python_datasink_jsonl_roundtrip(spark, tmp_path):
    """Custom Python DataSink (Spark 4 write path): every partition
    commits one JSON-lines file, the driver publishes _SUCCESS +
    manifest only after all tasks commit, and a plain JSON read round-trips
    the rows."""
    import json as _json

    from spark_streaming_practicum_spark.sources.synthetic import register_sink

    register_sink(spark)
    out = str(tmp_path / "jsonl")
    df = (
        table(spark, SF_DIR, "events")
        .select("event_id", "event_type", "user_id")
        .repartition(4)
    )
    df.write.format("jsonl_dir").option("path", out).mode("append").save()

    manifest = _json.load(open(out + "/_MANIFEST.json"))
    assert manifest["rows"] == df.count()
    assert len(manifest["files"]) == 4
    back = spark.read.json(out)
    assert back.count() == df.count()
    assert {int(r["event_id"]) for r in back.select("event_id").collect()} == {
        int(r["event_id"]) for r in df.select("event_id").collect()
    }


def test_dynamic_partition_overwrite_backfills_one_day(spark, tmp_path):
    """INSERT OVERWRITE with partitionOverwriteMode=dynamic must replace
    ONLY the partitions present in the incoming frame — the single-day
    backfill every lake pipeline needs (static mode would wipe the whole
    table)."""
    out = str(tmp_path / "lake")
    events = table(spark, SF_DIR, "events").withColumn("event_date", F.to_date("ts"))
    events.write.partitionBy("event_date").parquet(out)
    days = sorted(r["event_date"] for r in events.select("event_date").distinct().collect())
    target = days[1]

    patched = (
        events.filter(F.col("event_date") == target)
        .withColumn("value", F.lit(0.0))
    )
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", None)
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        patched.write.mode("overwrite").partitionBy("event_date").parquet(out)
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
        else:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    back = spark.read.parquet(out)
    assert back.count() == events.count()  # other days untouched
    assert back.filter(F.col("event_date") == target).agg(
        F.sum(F.abs("value"))
    ).first()[0] == 0.0
    other = days[0]
    want = events.filter(F.col("event_date") == other).count()
    assert back.filter(F.col("event_date") == other).count() == want


def test_parquet_aggregate_pushdown_stats_only_scan(spark):
    """COUNT/MIN/MAX over a parquet table can be answered from footer
    statistics alone (DataSource V2 + aggregatePushdown): the plan
    carries PushedAggregation and no row ever reaches the JVM — at
    100 TB this turns full-table profiling aggregates into a metadata
    read. Kept as an explicit opt-in (the engine's default scans stay
    on V1, which the bucketed-join layout requires)."""
    prev_push = spark.conf.get("spark.sql.parquet.aggregatePushdown", "false")
    prev_v1 = spark.conf.get("spark.sql.sources.useV1SourceList", None)
    spark.conf.set("spark.sql.parquet.aggregatePushdown", "true")
    spark.conf.set("spark.sql.sources.useV1SourceList", "")
    try:
        df = spark.read.parquet(f"{SF_DIR}/orders.parquet").agg(
            F.count("*").alias("n"),
            F.min("o_totalprice").alias("mn"),
            F.max("o_totalprice").alias("mx"),
        )
        plan = formatted_plan(df)
        assert "PushedAggregation" in plan, plan[:3000]
        got = df.first()
        want = (
            table(spark, SF_DIR, "orders")
            .agg(F.count("*"), F.min("o_totalprice"), F.max("o_totalprice"))
            .first()
        )
        assert tuple(got) == tuple(want)
    finally:
        spark.conf.set("spark.sql.parquet.aggregatePushdown", prev_push)
        if prev_v1 is None:
            spark.conf.unset("spark.sql.sources.useV1SourceList")
        else:
            spark.conf.set("spark.sql.sources.useV1SourceList", prev_v1)


def test_aqe_runtime_join_strategy_conversion(spark):
    """AQE re-plans a SortMergeJoin into a BroadcastHashJoin at RUNTIME
    once the build side's actual size is known (static threshold
    disabled, adaptive threshold on) — the mechanism that rescues jobs
    whose cardinality estimates were wrong, which at 100 TB is most of
    them."""
    prev_static = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    prev_adapt = spark.conf.get(
        "spark.sql.adaptive.autoBroadcastJoinThreshold", None
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "10485760")
    try:
        o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
        n = spark.read.parquet(f"{SF_DIR}/nation.parquet")
        j = (
            o.join(n, o.o_custkey % 25 == n.n_nationkey)
            .groupBy("n_name")
            .agg(F.count("*").alias("n"))
        )
        rows = j.collect()  # execute so AQE can re-plan
        assert len(rows) == 25
        plan = formatted_plan(j)
        assert "isFinalPlan=true" in plan, plan[:2000]
        # initial plan: SMJ (static broadcast off); final plan: BHJ
        assert "BroadcastHashJoin" in plan, plan[:4000]
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_static)
        if prev_adapt is None:
            spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
        else:
            spark.conf.set(
                "spark.sql.adaptive.autoBroadcastJoinThreshold", prev_adapt
            )


def test_ignore_corrupt_files_scan_resilience(spark, tmp_path):
    """A lake directory with one corrupt member must still be readable
    with spark.sql.files.ignoreCorruptFiles=true — the multi-thousand-
    file reality where one bad object cannot be allowed to kill a
    100 TB scan (and, flipped off, the default loudly fails instead of
    silently dropping data)."""
    out = tmp_path / "lake"
    out.mkdir()
    df = table(spark, SF_DIR, "region")
    df.coalesce(1).write.mode("append").parquet(str(out))
    (out / "part-corrupt.parquet").write_bytes(b"PAR1 this is not a parquet file")
    prev = spark.conf.get("spark.sql.files.ignoreCorruptFiles")
    spark.conf.set("spark.sql.files.ignoreCorruptFiles", "true")
    try:
        got = spark.read.parquet(str(out)).count()
        assert got == df.count()
    finally:
        spark.conf.set("spark.sql.files.ignoreCorruptFiles", prev)


def test_merge_schema_on_read_unions_evolved_columns(spark, tmp_path):
    """mergeSchema=true reconciles files written before and after a
    column addition — the read-side half of schema evolution (the
    write-side DDL planner is plan_schema_evolution); old rows surface
    NULL for the new column instead of failing the scan."""
    out = str(tmp_path / "evolving")
    v1 = table(spark, SF_DIR, "region").select("r_regionkey", "r_name")
    v1.write.mode("append").parquet(out)
    v2 = table(spark, SF_DIR, "region").select(
        "r_regionkey", "r_name", F.lit("v2").alias("ingest_tag")
    )
    v2.write.mode("append").parquet(out)
    merged = spark.read.option("mergeSchema", "true").parquet(out)
    assert "ingest_tag" in merged.columns
    assert merged.count() == 2 * v1.count()
    assert merged.filter(F.col("ingest_tag").isNull()).count() == v1.count()


def test_foreachbatch_idempotent_upsert_across_restart(spark, tmp_path):
    """foreachBatch + checkpoint = effectively-once sink writes: a
    restarted query with an unchanged source re-commits NOTHING, and a
    replayed batch (simulated task retry re-invoking the writer with
    the same epoch) is neutralized by batch-id keyed dedup-on-read —
    the idempotent-upsert recipe every foreachBatch sink needs."""
    out = str(tmp_path / "upsert")
    ck = str(tmp_path / "ckpt")

    def write_batch(batch_df, epoch_id):
        (
            batch_df.withColumn("epoch", F.lit(int(epoch_id)))
            .write.mode("append")
            .parquet(out)
        )

    def run_once():
        q = (
            stream_table(spark, SF_DIR, "events")
            .select("event_id", "event_type")
            .writeStream.foreachBatch(write_batch)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    run_once()
    n_events = table(spark, SF_DIR, "events").count()
    first = spark.read.parquet(out).count()
    assert first == n_events

    run_once()  # restart with unchanged source: no reprocessing
    assert spark.read.parquet(out).count() == first

    # simulated task retry: same epoch written twice
    replay = table(spark, SF_DIR, "events").select("event_id", "event_type").limit(50)
    write_batch(replay, 0)
    raw = spark.read.parquet(out)
    assert raw.count() == first + 50  # duplicates exist at file level...
    deduped = raw.dropDuplicates(["event_id", "epoch"])  # ...and die on read
    assert deduped.count() == first
