"""Round-12 mutate-and-detect pass over the certificate-style queries
(round-10 verdict task 8, pre-staged in round 11).

Rationale: ten queries carry in-query certificate columns (recall /
precision / containment / rank-bound booleans the oracle pins TRUE)
instead of — or in addition to — plain value parity. The certification
layer only has teeth if a seeded defect actually flips a certificate or
breaks the oracle match. This harness seeds one defect at a time and
asserts the strict driver-contract compare FAILS (DETECTED); a seeded
defect that still passes is a vacuous certificate (MISSED) and a
round-12 work item.

Two mutation mechanisms:
- ``attr``: monkeypatch a module-level constant the plan reads at call
  time (no source edit; runs in-process here).
- ``sed`` (round-12): a one-line predicate flip applied on a scratch
  branch (``git stash``-safe), documented as file:line + replacement so
  the pass is reproducible; these need a fresh interpreter per mutation.

TARGET TABLE with ROUND-11 TRIAL RESULTS (the sed mutations were run
early, in round 11, on a scratch branch — applied one at a time via
Edit, strict-compared at sf0.01, reverted via git checkout; exact
replacements below so the pass is reproducible):

| query | certificate column(s) | seeded defect | mechanism | result (r11) |
|---|---|---|---|---|
| dedup_minhash_lsh | lsh_recall_ge_90pct | MAX_BUCKET 64->0 starves candidate gen | attr | DETECTED (recall flag flipped) |
| dedup_minhash_lsh | (sample window) | CERT_SAMPLE_MOD 4->10**9+7 empties the audit window | attr | DETECTED (rows 0 vs 7) |
| dedup_minhash_lsh | lsh_precision_exact | self-pair off-by-one: candidates filter doc_a < doc_b -> <= (dedup.py:582) | sed | DETECTED (precision flag flipped) |
| dedup_simhash | simhash_recall_ge_80pct | HAMMING_MAX 6 -> -1 (no candidates) | attr | DETECTED (recall flag flipped) |
| sim_ann_lsh_bucketed | lsh_recall_ge_5pct | MULTIPROBE_HAMMING 1->0 (query bucket only) | attr | DETECTED (recall flag flipped) |
| sim_ann_ivf | ivf_recall_ge_10pct | IVF_NPROBE 2->0 (score no lists) | attr | DETECTED (recall flag flipped) |
| minhash_merge_certificate | merge_equals_direct + estimate_within_bound | merge daily sketches with F.max instead of F.min (dedup.py:1600) | sed | DETECTED (both flags flipped) |
| retrieval_wand_prune_certificate | pruned_topk_overlap (pinned 0) | ALL THREE term upper bounds * 0.5 (retrieval.py:899-901) | sed | DETECTED (overlap 20 vs 0) |
| retrieval_wand_prune_certificate | (same) | SINGLE-leg ub_0 * 0.5 | sed | MISSED — mutation INERT on this corpus (DuckDB agrees: term-0's bound never crosses theta); potency-check mutations in the oracle first |
| stream_dedup_within_watermark | kept_from_input | survivor corruption: kept event_id + 1 (streaming_equiv.py:174) | sed | DETECTED (containment flag flipped) |
| sketch_quantile_mergeable | rank_lower_ok | estimator picks wrong side: vhat F.min -> F.max (advanced.py:1064) | sed | DETECTED (lower-rank flag flipped) |
| curation_attrition_funnel | funnel counts via r_ok | dupf denominator: F.sum("c") -> F.count (curation.py:876) | sed | DETECTED (stage counts diverged) |
| dq_referential_integrity | ri_ok | orphan-count side swap: parent[pkey].isNull -> child[key].isNull (governance.py:1022) | sed | MISSED on clean data — n_orphans is 0 either way; FIXED round 11: tests/test_governance_falsifiability.py injects orphans and pins the flip |
| sketch_hll_handbuilt | merge_equals_direct | daily-sketch merge F.max -> F.min (advanced.py:789) | sed | DETECTED r12 (merge flag flipped FALSE) |
| sketch_misra_gries_heavyhitters | mg_underestimates + mg_error_within_bound | decrement becomes increment: c - sub -> c + sub (advanced.py:906) | sed | DETECTED r12 (mg_error_within_bound flipped) |
| sketch_bloom_fpr_audit | no_false_negatives | drop bit 0 from the filter (advanced.py:1201) | sed | MISSED r12 — INERT: bits_set output unchanged proves position 0 was never set at sf0.01 (oracle-side replication confirmed before blaming the certificate) |
| sketch_bloom_fpr_audit | no_false_negatives | drop SET bit 4 (potency-checked: 1500 members, pos 4 set, multiplicity 1) | sed | DETECTED r12 (flag flipped FALSE, bits_set 4095) |
| sketch_count_min_audit | never_underestimates | sketch built from odd keys only — the stale-sketch defect class (advanced.py:1309) | sed | DETECTED r12 (flag flipped FALSE, estimates diverged) |

Score after round 12: 18 mutations, 15 DETECTED, 3 informative misses
(2 inert-on-this-corpus — both potency-checked in the oracle before
being attributed; 1 clean-data limitation — fixed with a permanent
data-mutation falsifier test). All 5 attr mutations RE-RUN in round 12
after the similarity.py Hamming-ball / broadcast changes: 5/5 still
DETECTED. The companion clean-data-vacuity audit is
scripts/certificate_vacuity_audit.py (0 vacuous certificates; data
falsifiers in tests/test_governance_falsifiability.py and
tests/test_privacy_falsifiability.py).

Usage: python scripts/mutation_probe_r12.py [mutation_id ...]
Default: all ``attr`` mutations. The sed mutations are documented above
(file:line + exact replacement) and were executed in round 11.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb  # noqa: E402

from scripts.driver_contract_sweep import TABLES, canon  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"

# mutation_id -> (query_name, module_path, attr, mutated_value, defect)
ATTR_MUTATIONS = {
    "minhash_max_bucket_zero": (
        "dedup_minhash_lsh",
        "spark_streaming_practicum_spark.operators.dedup",
        "MAX_BUCKET",
        0,
        "hot-bucket guard drops EVERY band bucket -> zero LSH candidates "
        "-> sampled recall 0 -> lsh_recall_ge_90pct must flip FALSE",
    ),
    "minhash_cert_sample_all_odd": (
        "dedup_minhash_lsh",
        "spark_streaming_practicum_spark.operators.dedup",
        "CERT_SAMPLE_MOD",
        1_000_000_007,
        "certificate subsample becomes ~empty (doc_id % big == 0 only "
        "for doc 0) -> output row set changes -> value/row-count FAIL "
        "(pins that the sample window itself is load-bearing)",
    ),
    "simhash_hamming_negative": (
        "dedup_simhash",
        "spark_streaming_practicum_spark.operators.dedup",
        "HAMMING_MAX",
        -1,
        "hamming <= -1 admits zero candidate pairs -> sampled recall 0 "
        "-> simhash_recall_ge_80pct must flip FALSE",
    ),
    "ivf_nprobe_zero": (
        "sim_ann_ivf",
        "spark_streaming_practicum_spark.operators.similarity",
        "IVF_NPROBE",
        0,
        "probe scores zero inverted lists -> IVF leg returns nothing -> "
        "ivf_recall_ge_10pct must flip FALSE (or the probe crashes; "
        "either is a detection)",
    ),
    "ann_lsh_no_multiprobe": (
        "sim_ann_lsh_bucketed",
        "spark_streaming_practicum_spark.operators.similarity",
        "MULTIPROBE_HAMMING",
        0,
        "drop the 8 one-bit-flip probe buckets (query bucket only) -> "
        "measured recall sits exactly at the 0.05 floor with multiprobe, "
        "so any loss flips lsh_recall_ge_5pct FALSE",
    ),
}


def run_one(mutation_id: str) -> bool:
    """Apply one attr mutation, strict-compare its query vs the oracle.

    Returns True when the seeded defect is DETECTED (compare fails)."""
    import importlib

    name, module_path, attr, value, defect = ATTR_MUTATIONS[mutation_id]
    mod = importlib.import_module(module_path)
    original = getattr(mod, attr)
    import importlib.util as ilu

    spec = ilu.spec_from_file_location("__spark_entry__", "/root/repo/__spark_entry__.py")
    entry = ilu.module_from_spec(spec)
    spec.loader.exec_module(entry)
    qs, osql = entry.queries(), entry.oracle_sql()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    print(f"[{mutation_id}] {name}: {attr} {original} -> {value}")
    print(f"  seeded defect: {defect}")
    setattr(mod, attr, value)
    try:
        t0 = time.time()
        sdf = qs[name](spark, SF_DIR)
        s_cols = sorted(sdf.columns)
        s_rows = sorted(
            (tuple(canon(v) for v in (r[c] for c in s_cols)) for r in sdf.collect()),
            key=repr,
        )
        cur = con.execute(osql[name])
        o_cols = sorted(d[0] for d in cur.description)
        o_idx = [[d[0] for d in cur.description].index(c) for c in o_cols]
        o_rows = sorted(
            (tuple(canon(r[j]) for j in o_idx) for r in cur.fetchall()), key=repr
        )
        ok = s_cols == o_cols and s_rows == o_rows
        detected = not ok
        why = ""
        if detected:
            why = (
                "columns diverged"
                if s_cols != o_cols
                else f"rows {len(s_rows)} vs {len(o_rows)}"
                if len(s_rows) != len(o_rows)
                else "values diverged (certificate flipped or scores moved)"
            )
    except Exception as exc:  # a crash is also a detection
        detected, why = True, f"query raised: {exc!r:.200}"
    finally:
        setattr(mod, attr, original)
    print(
        f"  -> {'DETECTED' if detected else 'MISSED (vacuous certificate!)'}"
        f" {why} ({time.time() - t0:.1f}s)"
    )
    return detected


def main() -> int:
    wanted = sys.argv[1:] or list(ATTR_MUTATIONS)
    unknown = [w for w in wanted if w not in ATTR_MUTATIONS]
    if unknown:
        sys.exit(f"unknown mutation ids {unknown}; known: {list(ATTR_MUTATIONS)}")
    missed = [m for m in wanted if not run_one(m)]
    print(
        f"\n{len(wanted) - len(missed)} detected, {len(missed)} missed"
        + (f": {missed}" if missed else "")
    )
    return 1 if missed else 0


if __name__ == "__main__":
    sys.exit(main())
