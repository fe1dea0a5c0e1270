"""Rotation audit: which registered queries has the driver's
correctness gate EVER sampled, and what should the next round's
enumeration head be?

The driver samples the first ~50 names of `__spark_entry__.queries()`
each round (CORRECTNESS_r*.json records the result). The enumeration
order is the repo's only lever for steering that sample, so each round
leads with (a) queries whose OUTPUT changed since their last green row
and (b) the next tranche of never-sampled names (round-6 verdict
task 1: retire the tail before growing the registry).

Usage: python scripts/rotation_audit.py [N]
Prints per-family never-sampled counts and the suggested next-tranche
names (default N=46), grouped by family, oldest families first by
remaining count.
"""

from __future__ import annotations

import glob
import json
import sys
from collections import Counter, defaultdict

sys.path.insert(0, "/root/repo")


def main() -> None:
    sampled: set[str] = set()
    for path in sorted(glob.glob("/root/repo/CORRECTNESS_r*.json")):
        with open(path) as f:
            rows = json.load(f)
        names = rows.keys() if isinstance(rows, dict) else [
            r["name"] for r in rows
        ]
        sampled.update(names)

    from spark_streaming_practicum_spark.registry import all_queries

    registry = list(all_queries())
    never = [n for n in registry if n not in sampled]
    fam = lambda n: n.split("_", 1)[0]
    by_family: dict[str, list[str]] = defaultdict(list)
    for n in never:
        by_family[fam(n)].append(n)

    print(f"registry {len(registry)}, ever-sampled {len(sampled & set(registry))}, "
          f"never-sampled {len(never)}")
    print("\nnever-sampled by family:")
    for f_, names in sorted(by_family.items(), key=lambda kv: -len(kv[1])):
        print(f"  {f_:12s} {len(names):3d}  {' '.join(names[:4])}"
              f"{' ...' if len(names) > 4 else ''}")

    budget = int(sys.argv[1]) if len(sys.argv) > 1 else 46
    print(f"\nsuggested next tranche ({budget} names, largest families first):")
    tranche: list[str] = []
    for f_, names in sorted(by_family.items(), key=lambda kv: -len(kv[1])):
        take = names[: max(0, budget - len(tranche))]
        tranche.extend(take)
        if len(tranche) >= budget:
            break
    for n in tranche:
        print(f'    "{n}",')


if __name__ == "__main__":
    main()
