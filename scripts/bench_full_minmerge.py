"""BENCH_FULL min-merge: run `python bench.py --full` N times back-to-back,
merge per-query minima into BENCH_FULL.json (same shape as a single run, so
`bench.py --compare <prev> --detail BENCH_FULL.json` works unmodified).
Per-run totals + host signatures kept in `runs`; top-level `host` is the
worst value of each signature field across runs (round-11 ADVICE rule, same
as scripts/bench_minmerge.py). Errors from any run abort the merge.

Usage: python scripts/bench_full_minmerge.py [N]   (default 3)
"""
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FULL = os.path.join(REPO, "BENCH_FULL.json")


def main() -> None:
    n = 3
    if len(sys.argv) > 1:
        if not (sys.argv[1].isdigit() and int(sys.argv[1]) > 0):
            sys.exit(f"usage: {sys.argv[0]} [N] — N must be a positive integer")
        n = int(sys.argv[1])
    merged: dict[str, float] = {}
    runs = []
    base = None
    for i in range(n):
        r = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py"), "--full"],
            cwd=REPO,
            capture_output=True,
            text=True,
        )
        if r.returncode != 0:
            sys.exit(f"run {i + 1}/{n} failed:\n{r.stdout[-2000:]}\n{r.stderr[-2000:]}")
        with open(FULL) as f:
            d = json.load(f)
        if d.get("errors"):
            sys.exit(f"run {i + 1}/{n} had errors: {d['errors']}")
        base = d
        runs.append({"value": d["value"], "host": d.get("host", {})})
        for name, t in d["queries"].items():
            if name not in merged or t < merged[name]:
                merged[name] = t
        print(f"run {i + 1}/{n}: {d['value']}s  host={json.dumps(d.get('host', {}))}", flush=True)
    assert base is not None
    base["queries"] = merged
    base["value"] = round(sum(merged.values()), 3)
    base["runs"] = runs
    base["metric"] = base["metric"].replace(", 1 run)", f", min-merge of {n})")
    worst: dict = {"min_merge_runs": n}
    for r in runs:
        for k, v in (r.get("host") or {}).items():
            if k not in worst or v > worst[k]:
                worst[k] = v
    base["host"] = worst
    with open(FULL, "w") as f:
        json.dump(base, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"merged floor: {base['value']}s over {len(merged)} queries -> BENCH_FULL.json", flush=True)


if __name__ == "__main__":
    main()
