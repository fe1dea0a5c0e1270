"""Physical-plan assertions for the session-3 packs (retrieval, web
curation, sequence analytics, covariance): the shapes that survive a
100x scale-up."""

from __future__ import annotations

import re

from spark_streaming_practicum_spark.plans import (
    broadcast_join_count,
    formatted_plan,
)
from spark_streaming_practicum_spark.registry import all_queries

from .conftest import SF_DIR

DEFS = all_queries()


def _scan_count(plan: str) -> int:
    return len(re.findall(r"^\(\d+\) Scan parquet", plan, flags=re.M))


def _exchange_count(plan: str) -> int:
    return len(re.findall(r"^\(\d+\) Exchange", plan, flags=re.M))


def test_bm25_single_corpus_scan(spark):
    """Fixed query terms fold TF into the doc-length aggregate, so the
    corpus is tokenized in one aggregate shape; the constants branch
    must REUSE that exchange at runtime (AQE applies reuse adaptively,
    so assert on the executed plan, not the static one)."""
    df = DEFS["text_bm25_topk"].fn(spark, SF_DIR)
    df.collect()
    final = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in final, final[:500]
    assert "ReusedExchange" in final or "ReusedQueryStage" in final, final[:3000]
    plan = formatted_plan(df)
    assert "TakeOrderedAndProject" in plan


def test_domain_quota_single_shuffle(spark):
    """Quota sampling = one exchange on the domain key feeding the
    ranking window; nothing else moves."""
    plan = formatted_plan(DEFS["domain_quota_sample"].fn(spark, SF_DIR))
    assert _scan_count(plan) == 1, plan[:3000]
    # one exchange for the window partitioning (+ none for the final
    # orderBy beyond range partitioning of the tiny result)
    assert _exchange_count(plan) <= 2, plan[:3000]


def test_vocab_oov_broadcasts_vocab(spark):
    """The top-K vocab (50 rows) must broadcast into the LEFT join —
    the token stream never shuffles for the membership probe."""
    df = DEFS["vocab_oov_rate"].fn(spark, SF_DIR)
    assert broadcast_join_count(df) >= 1, formatted_plan(df)[:3000]


def test_fuzzy_join_no_cartesian(spark):
    """Blocked edit-distance join must plan as an equi-join on the
    block key with the distance as a residual filter — never a
    cartesian/nested-loop over the dictionaries."""
    plan = formatted_plan(DEFS["fuzzy_join_blocked_levenshtein"].fn(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan, plan[:3000]


def test_transition_matrix_single_user_shuffle(spark):
    """LEAD pairing rides ONE exchange on user_id; the count + row
    normalization operate on the tiny (from, to) key space."""
    plan = formatted_plan(DEFS["event_transition_probs"].fn(spark, SF_DIR))
    assert _scan_count(plan) == 1, plan[:3000]
    assert len(re.findall(r"hashpartitioning\(user_id", plan)) >= 1, plan[:3000]


def test_covariance_shuffles_partials_not_rows(spark):
    """The Gram-matrix op must reduce inside mapInPandas: the exchange
    after the Python stage carries (i, j) partials, never per-vector
    rows — assert the aggregate groups on the pair key right above the
    Python evaluation."""
    plan = formatted_plan(DEFS["embedding_covariance_topk"].fn(spark, SF_DIR))
    assert "MapInPandas" in plan, plan[:3000]
    assert re.search(r"hashpartitioning\(i#\d+, j#\d+", plan), plan[:3000]


def test_sparse_cosine_no_cartesian(spark):
    """The inverted-index self-join is an equi-join on token with the
    doc_id inequality as residual — the df cap is what bounds the
    candidate count, not a nested loop."""
    plan = formatted_plan(DEFS["sparse_cosine_pairs_topk"].fn(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    # the only nested-loop joins allowed are the 1-row scalar broadcasts
    # (corpus count); the token self-join must be an equi hash/merge join
    assert re.search(r"(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin) Inner", plan), plan[:3000]
