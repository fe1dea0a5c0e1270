"""Build bench_history/BENCH_BEST.json: per-query best-ever minima
across every committed BENCH_DETAIL_r*.json (round-9 verdict task 3 —
`--compare` against BOTH the last-round floor and the best-ever minima
so host direction is visible). The output is shaped like a
BENCH_DETAIL file so `python bench.py --compare
bench_history/BENCH_BEST.json` works unmodified; `sources` records
which round supplied each minimum."""
import glob
import json
import os
import sys

HIST = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "bench_history")


def main() -> None:
    best: dict[str, float] = {}
    src: dict[str, str] = {}
    paths = sorted(glob.glob(os.path.join(HIST, "BENCH_DETAIL_r*.json")))
    if not paths:
        sys.exit("no BENCH_DETAIL_r*.json under bench_history/")
    for p in paths:
        with open(p) as f:
            d = json.load(f)
        for name, t in d.get("queries", {}).items():
            if name not in best or t < best[name]:
                best[name] = t
                src[name] = os.path.basename(p)
    out = {
        "metric": "headline query wall time (noop-materialized)",
        "value": round(sum(best.values()), 3),
        "unit": "sec",
        "n_queries": len(best),
        "queries": best,
        "sources": src,
        "note": "per-query best-ever minima across " + ", ".join(os.path.basename(p) for p in paths),
    }
    dst = os.path.join(HIST, "BENCH_BEST.json")
    with open(dst, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(f"{dst}: {len(best)} queries, sum-of-minima {out['value']}s")


if __name__ == "__main__":
    main()
