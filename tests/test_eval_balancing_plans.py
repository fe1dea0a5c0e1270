"""Physical-plan and property assertions for the round-2 additions:
retrieval-eval metrics, corpus balancing, paragraph dedup, PCA power
iteration, logistic GD, and the compaction planner."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from spark_streaming_practicum_spark.plans import (
    broadcast_join_count,
    formatted_plan,
)
from spark_streaming_practicum_spark.registry import all_queries

from .conftest import SF_DIR

DEFS = all_queries()


def _scan_count(plan: str) -> int:
    return len(re.findall(r"^\(\d+\) Scan parquet", plan, flags=re.M))


def test_eval_run_broadcasts_query_set(spark):
    """The ranked run must broadcast the tiny query side against the
    candidate scan — the corpus never shuffles to score."""
    for name in ("eval_ndcg_at_k", "eval_mrr_recall_at_k"):
        df = DEFS[name].fn(spark, SF_DIR)
        plan = formatted_plan(df)
        assert "BroadcastNestedLoopJoin" in plan or broadcast_join_count(df) >= 1, (
            name + "\n" + plan[:3000]
        )
        assert "CartesianProduct" not in plan, name


def test_eval_metrics_bounded():
    """NDCG/MRR/recall live in [0, 1] by construction — checked on the
    collected sf output in parity tests; here just the range contract."""
    # ranges asserted in test_eval_values below with a live session


def test_eval_values_in_range(spark):
    ndcg = {r.qid: r.ndcg_at_k for r in DEFS["eval_ndcg_at_k"].fn(spark, SF_DIR).collect()}
    mrr = DEFS["eval_mrr_recall_at_k"].fn(spark, SF_DIR).collect()
    assert ndcg and all(0.0 <= v <= 1.0 for v in ndcg.values())
    assert all(0.0 <= r.mrr_at_k <= 1.0 and 0.0 <= r.recall_at_k <= 1.0 for r in mrr)


def test_temperature_resample_invariants(spark):
    rows = DEFS["lang_temperature_resample"].fn(spark, SF_DIR).collect()
    assert abs(sum(r.p_share for r in rows) - 1.0) < 1e-4
    assert abs(sum(r.q_share for r in rows) - 1.0) < 1e-4
    # alpha < 1 compresses: the largest language is down-sampled,
    # the smallest up-sampled
    big = max(rows, key=lambda r: r.tok_count)
    small = min(rows, key=lambda r: r.tok_count)
    assert big.resample_factor < 1.0 < small.resample_factor


def test_length_buckets_partition_corpus(spark):
    from spark_streaming_practicum_spark.catalog import table

    rows = DEFS["length_bucket_batches"].fn(spark, SF_DIR).collect()
    n_docs = table(spark, SF_DIR, "documents").count()
    assert sum(r.n_docs for r in rows) == n_docs
    assert all(0.0 <= r.waste_frac < 1.0 for r in rows)


def test_paragraph_dedup_single_hash_shuffle(spark):
    """Paragraph dedup shuffles hashes, not text: the exchanges carry
    the md5 column, and segment text appears in no exchange."""
    df = DEFS["dedup_paragraph_exact"].fn(spark, SF_DIR)
    plan = formatted_plan(df)
    assert _scan_count(plan) == 1, plan[:3000]
    # fractions survive: every kept_frac in (0, 1) given the HAVING filter
    rows = df.collect()
    assert all(0.0 < r.kept_frac < 1.0 for r in rows)
    assert all(r.kept_paragraphs < r.n_paragraphs for r in rows)


def test_pca_unit_norm_and_single_corpus_scan(spark):
    df = DEFS["pca_power_iteration_top_pc"].fn(spark, SF_DIR)
    plan = formatted_plan(df)
    # the corpus-sized embeddings table feeds a cached covariance: the
    # mirror union and all 3 iterations read the InMemoryRelation, so
    # the parquet is scanned exactly once at materialization
    assert "InMemoryTableScan" in plan or "InMemoryRelation" in plan, plan[:3000]
    rows = df.collect()
    assert len(rows) == 64
    norm = sum(r.weight**2 for r in rows) ** 0.5
    assert abs(norm - 1.0) < 1e-3
    top = max(rows, key=lambda r: abs(r.weight))
    assert top.weight > 0  # sign convention: dominant component positive


def test_logreg_improves_over_chance(spark):
    row = DEFS["logreg_gd_two_steps"].fn(spark, SF_DIR).collect()[0]
    import math

    # 1/3 of rows are 'R': all-negative predicts ~0.667 accuracy; the
    # model must at least not be degenerate and loss must beat ln(2)
    assert 0.0 < row.log_loss < math.log(2.0) + 0.05
    assert 0.5 <= row.accuracy <= 1.0


def test_logreg_no_collect_single_plan(spark):
    """The whole 2-step + eval pipeline is ONE lazy plan: weight vectors
    enter as broadcast one-row joins, never via driver collect."""
    df = DEFS["logreg_gd_two_steps"].fn(spark, SF_DIR)
    plan = formatted_plan(df)
    assert "BroadcastNestedLoopJoin" in plan, plan[:3000]
    assert "CartesianProduct" not in plan


def test_compaction_bins_fill_to_target(spark):
    rows = DEFS["compaction_bin_packing"].fn(spark, SF_DIR).collect()
    by_part = {}
    for r in rows:
        by_part.setdefault((r.source, r.lang), []).append(r)
    for part, bins in by_part.items():
        bins.sort(key=lambda r: r.bin_id)
        # bin ids are dense from 0
        assert [b.bin_id for b in bins] == list(range(len(bins))), part
        # next-fit property: every non-final bin reaches the target
        for b in bins[:-1]:
            assert b.bytes_total >= 4096, (part, b.bin_id, b.bytes_total)
