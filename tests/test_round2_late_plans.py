"""Plan + property assertions for the late-round-2 additions (robust
stats, stump learning, product quantization, containment dedup)."""

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


def test_mad_medians_broadcast_back(spark):
    """Both median frames (5 rows each) must ride broadcasts — the raw
    events table is never shuffled on a per-row key."""
    df = DEFS["median_mad_outliers"].fn(spark, SF_DIR)
    assert broadcast_join_count(df) >= 2, formatted_plan(df)[:3000]


def test_benford_shares_sum_to_one(spark):
    rows = DEFS["benford_first_digit"].fn(spark, SF_DIR).collect()
    assert {r["digit"] for r in rows} <= set(range(1, 10))
    assert abs(sum(r["obs_share"] for r in rows) - 1.0) < 1e-4
    # Benford expectation itself sums to 1 across digits 1..9
    assert abs(sum(r["benford_share"] for r in rows) - 1.0) < 1e-4


def test_stump_gain_nonnegative_and_single_scan_binning(spark):
    """Information gain of any split is >= 0, and the binning pass must
    not re-scan events once per threshold (the histogram trick)."""
    df = DEFS["decision_stump_info_gain"].fn(spark, SF_DIR)
    rows = df.collect()
    assert len(rows) == 9
    assert all(r["gain"] >= 0 for r in rows)
    assert all(r["n_left"] + r["n_right"] == rows[0]["n_left"] + rows[0]["n_right"] for r in rows)
    plan = formatted_plan(df)
    n_event_scans = len(
        re.findall(r"^\(\d+\) Scan parquet .*events", plan, flags=re.M)
    )
    # one scan feeds the bin histogram, one the global totals — never 9
    assert n_event_scans <= 2, plan[:3000]


def test_pq_codebook_covers_all_cells_and_broadcasts(spark):
    """Assignment joins must broadcast the 16-row codebooks; every
    (subspace, code) cell is non-empty on the test corpus and cell
    counts per subspace sum to the corpus size."""
    df = DEFS["embedding_pq_codebook"].fn(spark, SF_DIR)
    plan = formatted_plan(df)
    assert broadcast_join_count(df) >= 2, plan[:3000]
    assert "CartesianProduct" not in plan
    rows = df.collect()
    n = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").count()
    by_sub = {}
    for r in rows:
        by_sub.setdefault(r["subspace"], 0)
        by_sub[r["subspace"]] += r["n_vecs"]
        assert r["avg_sq_error"] >= 0
    assert set(by_sub) == {0, 1, 2, 3}
    assert all(v == n for v in by_sub.values())


def test_containment_at_least_jaccard_pairs(spark):
    """Overlap coefficient >= Jaccard, so every Jaccard-0.8 pair must
    also appear in the containment-0.8 output."""
    cont = {
        (r["doc_a"], r["doc_b"])
        for r in DEFS["dedup_containment_overlap"].fn(spark, SF_DIR).collect()
    }
    jac = {
        (r["doc_a"], r["doc_b"])
        for r in DEFS["dedup_ngram_jaccard"].fn(spark, SF_DIR).collect()
    }
    assert jac <= cont


def test_kappa_bounds(spark):
    row = DEFS["eval_cohens_kappa"].fn(spark, SF_DIR).collect()[0]
    assert -1.0 <= row["kappa"] <= 1.0
    assert 0.0 <= row["po"] <= 1.0
    assert 0.0 <= row["pe"] <= 1.0


def test_seasonal_components_reassemble(spark):
    """trend + seasonal + residual must reconstruct the observed count."""
    rows = DEFS["ts_seasonal_decompose_dow"].fn(spark, SF_DIR).collect()
    assert rows, "decomposition produced no interior days"
    for r in rows:
        assert abs((r["trend"] + r["seasonal"] + r["residual"]) - r["n"]) < 1e-4
