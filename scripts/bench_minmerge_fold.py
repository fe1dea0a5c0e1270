"""Fold ONE more `python bench.py` run into an existing min-merged
BENCH_DETAIL.json (the round ritual folds a 4th run when measured steal
exceeded ~2% on any of the scripted 3). Saves the current merged file,
runs bench.py once (which overwrites BENCH_DETAIL.json with a single-run
detail), then re-merges per-query minima, appends the run to `runs`, and
re-derives the worst-of-runs host signature per the round-11 ADVICE rule.

Usage: python scripts/bench_minmerge_fold.py [--full]
  --full folds into BENCH_FULL.json via `bench.py --full` instead.
"""
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    full = "--full" in sys.argv[1:]
    target = os.path.join(REPO, "BENCH_FULL.json" if full else "BENCH_DETAIL.json")
    with open(target) as f:
        merged_doc = json.load(f)
    if "runs" not in merged_doc:
        sys.exit(f"{target} is not a min-merged file (no `runs`); run the N-run script first")
    cmd = [sys.executable, os.path.join(REPO, "bench.py")] + (["--full"] if full else [])
    r = subprocess.run(cmd, cwd=REPO, capture_output=True, text=True)
    if r.returncode != 0:
        # restore the merged doc bench.py just clobbered
        with open(target, "w") as f:
            json.dump(merged_doc, f, indent=1, sort_keys=True)
            f.write("\n")
        sys.exit(f"fold run failed (merged file restored):\n{r.stdout[-2000:]}\n{r.stderr[-2000:]}")
    with open(target) as f:
        new = json.load(f)
    if new.get("errors"):
        with open(target, "w") as f:
            json.dump(merged_doc, f, indent=1, sort_keys=True)
            f.write("\n")
        sys.exit(f"fold run had errors (merged file restored): {new['errors']}")
    print(f"fold run: {new['value']}s  host={json.dumps(new.get('host', {}))}", flush=True)
    merged = merged_doc["queries"]
    for name, t in new["queries"].items():
        if name not in merged or t < merged[name]:
            merged[name] = t
    merged_doc["runs"].append({"value": new["value"], "host": new.get("host", {})})
    n = len(merged_doc["runs"])
    merged_doc["value"] = round(sum(merged.values()), 3)
    # Two stamp styles exist: the headline scripts append " (min-merge
    # of N)" after the metric, while bench_full_minmerge rewrites the
    # ", 1 run)" inside the full metric to ", min-merge of N)". Update
    # whichever form is present (round-12 ADVICE: stripping only the
    # paren form re-created a double stamp on full files).
    m = merged_doc["metric"]
    if ", min-merge of " in m:
        m = re.sub(r", min-merge of \d+\)", f", min-merge of {n})", m)
    elif " (min-merge of " in m:
        m = m.rsplit(" (min-merge of ", 1)[0] + f" (min-merge of {n})"
    else:
        m = m + f" (min-merge of {n})"
    merged_doc["metric"] = m
    worst: dict = {"min_merge_runs": n}
    for run in merged_doc["runs"]:
        for k, v in (run.get("host") or {}).items():
            if k not in worst or v > worst[k]:
                worst[k] = v
    merged_doc["host"] = worst
    with open(target, "w") as f:
        json.dump(merged_doc, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"merged floor: {merged_doc['value']}s over {len(merged)} queries (min-of-{n}) -> {target}", flush=True)


if __name__ == "__main__":
    main()
