"""Round-12 close adjudication: isolated min-of-4 of every cross-band
flag from BOTH round-12 floor compares (headline min-of-4 vs the r11
headline floor: 2 flags; BENCH_FULL min-of-3 vs the r11 full floor: 20
flags; union 21) PLUS the 4 standing control queries, in ONE session on
a measured window — the same protocol as scripts/flag_adjudication_r10.py.

The controls' geomean ratio-vs-best-ever IS the session multiplier
(their plans are byte-unchanged since round 6); a flag is CLOSED when
its own ratio / the multiplier <= bench.COMPARE_BAND. Best-ever minima
come from bench_history/BENCH_BEST.json (headline queries); queries that
exist only in the full registry use the round-11 BENCH_FULL min-of-3
floor as their reference (the round-11 convention for
recursive_cte_reachability — full-only queries have no headline
best-ever), read from git's committed copy via --r11-full PATH.

Every run this round carried steal 2.75-5.15% (no quiet window), so the
control-normalized ratio, not wall clock, is the verdict per the pinned
host-variance note in PERFORMANCE.md.

Usage: python scripts/flag_adjudication_r12.py [--r11-full PATH]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_DRIVER_MEMORY", "24g")

import bench
from spark_streaming_practicum_spark.functions.ranks import release_persisted_frames
from spark_streaming_practicum_spark.registry import all_queries
from spark_streaming_practicum_spark.session import build_session

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Union of the two round-12 floor-compare INVESTIGATE lists
# (bench_history/compare_full_r12_vs_r11.log + the headline compare).
# nb_lang_classifier_eval is the ONE flag whose plan changed this round
# (round-12 broadcast audit de-hinted its vocab-sized scoring join);
# the other 20 are byte-untouched since at least round 11.
FLAGS = [
    "attribution_markov_removal",
    "eval_pass_at_k",
    "join_yannakakis_semijoin_reduce",
    "keyphrase_textrank",
    "linkage_sorted_neighborhood",
    "lm_stupid_backoff_trigram",
    "moe_router_load_balance",
    "nb_lang_classifier_eval",
    "negative_sampling_unigram",
    "percentile_approx_sketch",
    "pipeline_bronze_to_gold",
    "pipeline_corpus_curation",
    "pipeline_pretraining_prep",
    "q20_dominant_supplier",
    "stats_runs_test_daily",
    "stream_session_window_true",
    "stream_stateful_user_profile",
    "stream_tws_map_state_type_counts",
    "ts_ljung_box_portmanteau",
    "wilcoxon_signed_rank",
    "xicor_correlation",
]
CONTROLS = {
    "agg_pricing_summary": 0.955,
    "join_q3_shipping_priority": 0.642,
    "window_topk_per_group": 0.268,
    "text_bm25_topk": 0.337,
}


def main() -> None:
    r11_full_path = None
    args = sys.argv[1:]
    if "--r11-full" in args:
        r11_full_path = args[args.index("--r11-full") + 1]
    with open(os.path.join(REPO, "bench_history", "BENCH_BEST.json")) as f:
        best = json.load(f)["queries"]
    r11_full = {}
    if r11_full_path:
        with open(r11_full_path) as f:
            r11_full = json.load(f)["queries"]

    def best_of(name: str) -> tuple[float, str]:
        if name in best:
            return best[name], "best-ever"
        return r11_full[name], "r11-full-floor"

    sf_dir = "/root/testdata/sf0.1"
    spark = build_session(app_name="ssp-flag-adjudication-r12")
    defs = all_queries()
    for n in FLAGS + list(CONTROLS):
        defs[n].fn(spark, "/root/testdata/sf0.001").write.mode("overwrite").format(
            "noop"
        ).save()
    spark.catalog.clearCache()
    release_persisted_frames()
    cpu0 = bench._cpu_sample()

    def min4(name: str) -> dict:
        runs = []
        for _ in range(4):
            t0 = time.perf_counter()
            defs[name].fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            runs.append(round(time.perf_counter() - t0, 3))
            spark.catalog.clearCache()
            release_persisted_frames()
        return {"runs": runs, "min": min(runs)}

    ctl = {}
    for n, b in CONTROLS.items():
        r = min4(n)
        ctl[n] = {**r, "best_ever": b, "ratio": round(r["min"] / b, 3)}
        print(f"control {n}: min {r['min']} vs best {b} = {ctl[n]['ratio']}x", flush=True)
    mult = 1.0
    for n in ctl:
        mult *= ctl[n]["ratio"]
    mult = round(mult ** (1.0 / len(ctl)), 3)
    print(f"session multiplier (control geomean): {mult}x", flush=True)

    flg = {}
    for n in FLAGS:
        b, src = best_of(n)
        r = min4(n)
        ratio = round(r["min"] / b, 3)
        norm = round(ratio / mult, 3)
        flg[n] = {
            **r,
            "best": b,
            "best_source": src,
            "ratio_vs_best": ratio,
            "normalized": norm,
            "closed": norm <= bench.COMPARE_BAND,
        }
        print(
            f"flag {n}: min {r['min']} vs {src} {b} = {ratio}x raw, "
            f"{norm}x normalized -> {'CLOSED' if flg[n]['closed'] else 'OPEN'}",
            flush=True,
        )

    out = {
        "host": bench._host_signature(cpu0),
        "session_multiplier": mult,
        "controls": ctl,
        "flags": flg,
        "open": sorted(n for n in flg if not flg[n]["closed"]),
    }
    print(json.dumps(out, indent=1, sort_keys=True))
    spark.stop()


if __name__ == "__main__":
    main()
