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

# Parse argv BEFORE importing the r3/r4 probes: scale_probe_r3 runs
# int(sys.argv[1]) at import time, so a leading query name (REPL is
# optional per the usage line) must not reach it. argv[1] is REPL only
# if it is all digits; every non-digit arg is a query name.
_ARGS = sys.argv[1:]
_REPL = int(_ARGS[0]) if _ARGS and _ARGS[0].isdigit() else 20
_NAMES = [a for a in _ARGS if not a.isdigit()]
# scale_probe_r4.main reads query names from sys.argv[2:].
sys.argv = [sys.argv[0], str(_REPL)] + _NAMES

import scripts.scale_probe_r3 as r3  # noqa: E402
import scripts.scale_probe_r4 as r4  # noqa: E402
from scripts.scale_probe_r4 import main as _main  # noqa: E402

QUERIES = [
    "ts_interval_islands_merge",
    "dedup_simhash",
    "dedup_minhash_lsh",
]

if __name__ == "__main__":
    r4.QUERIES = QUERIES
    r3.REPL = r4.REPL = _REPL
    _main()
