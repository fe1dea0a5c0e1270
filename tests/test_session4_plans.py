"""Session-4 semantic pins for the new operators.

- dedup_longest_shared_run: the reported maximal run for the top pair
  equals an independent O(n*m) token-level longest-common-substring
  recomputation on that pair's raw texts (diagonal islands == LCS).
- cdc_content_defined_chunks: the INSERTION-ROBUSTNESS property that
  justifies CDC over fixed-size segmentation — inserting tokens into
  the middle of a doc leaves the chunks after the insertion point
  identical, so the two variants share most chunks.
- moe_router_load_balance: hash logits route near-uniformly, so the
  Switch aux loss sits near its optimum of 1.
- geo_point_in_polygon: ray-casting parity for known inside/outside
  points.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_streaming_practicum_spark.operators.spatial import _crossings_sql
from spark_streaming_practicum_spark.registry import all_queries

from .conftest import SF_DIR

DEFS = all_queries()


def _lcs_tokens(a: list[str], b: list[str]) -> int:
    best = 0
    prev = [0] * (len(b) + 1)
    for i in range(1, len(a) + 1):
        cur = [0] * (len(b) + 1)
        for j in range(1, len(b) + 1):
            if a[i - 1] == b[j - 1]:
                cur[j] = prev[j - 1] + 1
                best = max(best, cur[j])
        prev = cur
    return best


def test_longest_shared_run_matches_lcs_on_top_pair(spark):
    top = DEFS["dedup_longest_shared_run"].fn(spark, SF_DIR).limit(1).collect()[0]
    docs = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .filter(F.col("doc_id").isin(int(top.doc_a), int(top.doc_b)))
        .collect()
    }
    lcs = _lcs_tokens(
        docs[top.doc_a].split(" "), docs[top.doc_b].split(" ")
    )
    # df-capped seeds can only UNDER-report (a run whose every seed is
    # boilerplate); on this corpus the top pair's run is cold-seeded,
    # so the diagonal-island length must equal the true LCS exactly.
    assert top.longest_run == lcs, (top.longest_run, lcs)


def test_cdc_chunks_survive_mid_document_insertion(spark, tmp_path):
    base = " ".join(f"tok{i % 37}x{(i * 7) % 11}" for i in range(200))
    words = base.split(" ")
    inserted = " ".join(words[:100] + ["INS1", "INS2", "INS3"] + words[100:])
    rows = [
        (0, base, "en", "srcA", len(base)),
        (1, inserted, "en", "srcA", len(inserted)),
    ]
    df = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    )
    d = tmp_path / "cdc"
    df.repartition(1).write.parquet(str(d / "documents.parquet"))
    out = DEFS["cdc_content_defined_chunks"].fn(spark, str(d)).collect()
    assert len(out) == 1
    row = out[0]
    # identical chunks dedupe across the two variants: the insertion
    # only perturbs the chunk(s) containing it, so well over a third of
    # all chunk instances collapse (fixed-size segmentation would
    # re-align every boundary after position 100 and share ~half that).
    assert row.dup_ratio > 0.3, row
    assert row.n_chunks > row.n_distinct


def test_moe_router_balanced_near_optimum(spark):
    rows = DEFS["moe_router_load_balance"].fn(spark, SF_DIR).collect()
    assert len(rows) == 8
    aux = rows[0].aux_loss
    # uniform routing gives exactly 1; hash logits are near-uniform
    assert 0.9 < aux < 1.3, aux
    assert abs(sum(r.frac_routed for r in rows) - 1.0) < 1e-4


def test_point_in_polygon_known_points(spark):
    # polygon centroid-ish point is inside; antipode is outside
    inside = spark.sql(
        f"SELECT {_crossings_sql('-5.0', '-60.0')} % 2 = 1 AS yes"
    ).collect()[0].yes
    outside = spark.sql(
        f"SELECT {_crossings_sql('80.0', '170.0')} % 2 = 1 AS yes"
    ).collect()[0].yes
    assert inside is True
    assert outside is False
