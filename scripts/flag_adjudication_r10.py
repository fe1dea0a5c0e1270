"""Round-10 task-4 adjudication: isolated min-of-4 of the 8 round-9
cross-band flags PLUS 4 untouched control queries, in ONE session, on a
measured window. The controls' ratio-vs-best-ever IS the session
multiplier (byte-identical plans, untouched since round 6); a flag is
adjudicated CLOSED when its own ratio-vs-best-ever does not exceed the
session multiplier band the controls define (flag ratio / control
geomean <= COMPARE_BAND). Wall clock alone cannot close these: this VM's
session-to-session variance exceeds +-35% on sub-7s fixed-overhead
queries (PERFORMANCE.md round-8/9), and best-ever minima were set on
faster sessions than any round-10 window observed.

Usage: python scripts/flag_adjudication_r10.py
       python scripts/flag_adjudication_r10.py --interleaved FLAG CONTROL \
           [N [FLAG_BEST CTRL_BEST]]

The second form is the tie-breaker pass used for the two sub-2 s
flappers (round-11 ADVICE: committed so the protocol cited in
PERFORMANCE.md is reproducible): N alternating (flag, control) runs in
ONE session — both sides see the identical host trajectory — then
normalized = (flag_minN / flag_best) / (control_minN / control_best),
CLOSED when normalized <= bench.COMPARE_BAND. Best-ever minima come
from the FLAGS/CONTROLS tables below, else bench_history/BENCH_BEST.json,
else pass them explicitly (full-registry-only queries are not in the
173-query headline BENCH_BEST — use the prior round's BENCH_FULL floor).
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

# best-ever per-query minima across bench_history/BENCH_DETAIL_r0{2..9}
FLAGS = {
    "minhash_merge_certificate": 1.951,
    "dedup_longest_shared_run": 1.843,
    "nb_lang_classifier_eval": 1.041,
    "incremental_join_refresh": 0.856,
    "eval_chrf2_pairs": 0.959,
    "ml_quantile_reg_pinball": 0.75,
    "ml_gmm_em_step": 0.699,
    "agg_group_logsumexp": 0.556,
}
CONTROLS = {
    "agg_pricing_summary": 0.955,
    "join_q3_shipping_priority": 0.642,
    "window_topk_per_group": 0.268,
    "text_bm25_topk": 0.337,
}


def main() -> None:
    sf_dir = "/root/testdata/sf0.1"
    spark = build_session(app_name="ssp-flag-adjudication-r10")
    defs = all_queries()
    for n in list(FLAGS) + list(CONTROLS):
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
    for n, b in FLAGS.items():
        r = min4(n)
        ratio = round(r["min"] / b, 3)
        norm = round(ratio / mult, 3)
        flg[n] = {
            **r,
            "best_ever": b,
            "ratio_vs_best": ratio,
            "normalized": norm,
            "closed": norm <= bench.COMPARE_BAND,
        }
        print(
            f"flag {n}: min {r['min']} vs best {b} = {ratio}x raw, "
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


def _best_ever(name: str) -> float:
    if name in FLAGS:
        return FLAGS[name]
    if name in CONTROLS:
        return CONTROLS[name]
    best_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "bench_history",
        "BENCH_BEST.json",
    )
    with open(best_path) as f:
        best = json.load(f)
    return best["queries"][name]


def interleaved(
    flag: str,
    control: str,
    n_pairs: int = 8,
    flag_best: float | None = None,
    ctrl_best: float | None = None,
) -> None:
    """The min-of-N interleaved pairing pass (see module docstring)."""
    sf_dir = "/root/testdata/sf0.1"
    spark = build_session(app_name="ssp-flag-pairing")
    defs = all_queries()
    for name in (flag, control):
        defs[name].fn(spark, "/root/testdata/sf0.001").write.mode("overwrite").format(
            "noop"
        ).save()
    spark.catalog.clearCache()
    release_persisted_frames()
    cpu0 = bench._cpu_sample()

    def once(name: str) -> float:
        t0 = time.perf_counter()
        defs[name].fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        dt = round(time.perf_counter() - t0, 3)
        spark.catalog.clearCache()
        release_persisted_frames()
        return dt

    flag_runs, ctl_runs = [], []
    for _ in range(n_pairs):
        flag_runs.append(once(flag))
        ctl_runs.append(once(control))
    fb = flag_best if flag_best is not None else _best_ever(flag)
    cb = ctrl_best if ctrl_best is not None else _best_ever(control)
    fmin, cmin = min(flag_runs), min(ctl_runs)
    norm = round((fmin / fb) / (cmin / cb), 3)
    verdict = "CLOSED" if norm <= bench.COMPARE_BAND else "OPEN"
    print(
        f"{flag}: min{n_pairs} {fmin} (best {fb}) paired-with {control} "
        f"min{n_pairs} {cmin} (best {cb}) -> normalized {norm} {verdict}"
    )
    print(f"  flag runs: {flag_runs}")
    print(f"  ctl  runs: {ctl_runs}")
    print(f"host: {json.dumps(bench._host_signature(cpu0))}")
    spark.stop()


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--interleaved":
        interleaved(
            sys.argv[2],
            sys.argv[3],
            int(sys.argv[4]) if len(sys.argv) > 4 else 8,
            float(sys.argv[5]) if len(sys.argv) > 5 else None,
            float(sys.argv[6]) if len(sys.argv) > 6 else None,
        )
    else:
        main()
