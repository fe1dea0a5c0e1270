"""Round-8 scale probe: 20x rows for this round's changed batch plans.

- ts_interval_islands_merge: the round's one structural batch-plan
  change — the gaps-and-islands windows now run over DISTINCT (k, s)
  with per-start multiplicities pre-aggregated, so the window input
  shrinks by the duplicate factor and the ORDER BY keys are unique
  (the DuckDB-instability fix). Probe checks the window pass stays
  linear in distinct starts as replicas add keys.
- dedup_simhash / dedup_minhash_lsh: the verify leg's hot-shingle
  broadcast switched from raw shingle strings to xxhash64 longs and
  the _cold_shared test now hashes the (small) intersection array per
  pair — constant-factor changes on the round-7 plan; the re-probe
  confirms the r7 sublinear curvature is preserved.

Usage: python scripts/scale_probe_r8.py [REPL] [query ...]
Default REPL=20. Prints one line per query: name, 1x s, REPLx s, ratio.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Importing scale_probe_r3 is argv-safe since round 9 (it only reads
# argv[1] as REPL when it is all digits), so no argv surgery is needed
# at import time and sys.argv is NOT mutated as an import side effect.
import scripts.scale_probe_r3 as r3  # noqa: E402
import scripts.scale_probe_r4 as r4  # noqa: E402
from scripts.scale_probe_r4 import main as _main  # noqa: E402

QUERIES = [
    "ts_interval_islands_merge",
    "dedup_simhash",
    "dedup_minhash_lsh",
]

if __name__ == "__main__":
    # argv[1] is REPL only if all digits; every other arg is a query
    # name. A digit-looking arg in any later position is ambiguous
    # (REPL out of place? a query name?) — refuse it loudly rather than
    # silently discarding it.
    args = sys.argv[1:]
    # "0" passes isdigit() but a zero-replica lake is degenerate — treat
    # it as NOT a REPL so the stray-digit check below rejects it loudly.
    has_repl = bool(args) and args[0].isdigit() and int(args[0]) > 0
    repl = int(args[0]) if has_repl else 20
    names = args[1:] if has_repl else args
    stray = [a for a in names if a.isdigit()]
    if stray:
        sys.exit(
            f"usage: {sys.argv[0]} [REPL] [query ...] — REPL must be "
            f"argv[1]; got stray numeric args {stray}"
        )
    # scale_probe_r4.main reads query names from sys.argv[2:]; we ARE
    # the main script here, so rewriting our own argv is side-effect-free.
    sys.argv = [sys.argv[0], str(repl)] + names
    r4.QUERIES = QUERIES
    r3.REPL = r4.REPL = repl
    _main()
