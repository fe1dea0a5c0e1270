"""Round-7 scale probe: 50x rows for the 5-8 s full-sweep band that had
only 20x or no probe coverage (round-6 verdict tasks 3 + 5).

- asof_join_cogroup_pandas: the registry's slowest query (13.4 s cold
  at sf0.1) and the only top-cost one with NO probe row — the pandas
  cogroup path's Arrow+Python constant is known; the probe checks the
  per-row cost stays flat (user_id-keyed cogroups shard horizontally).
- ab_permutation_test: collapses to the per-user (sum, count) frame
  before the replicate relabelings; frame grows 50x with users.
- xicor_correlation: rank-based; rides the two-pass range-partition
  rank helper.
- graph_topo_layers: had a 20x row (r4); one more octave.

Usage: python scripts/scale_probe_r7.py [REPL] [query ...]
Default REPL=50. Prints one line per query: name, 1x s, REPLx s, ratio.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import scripts.scale_probe_r3 as r3  # noqa: E402
import scripts.scale_probe_r4 as r4  # noqa: E402
from scripts.scale_probe_r4 import main as _main  # noqa: E402

QUERIES = [
    "ab_permutation_test",
    "xicor_correlation",
    "graph_topo_layers",
    "asof_join_cogroup_pandas",
]

if __name__ == "__main__":
    r4.QUERIES = QUERIES
    # scale_probe_r3 parsed ITS argv at import; honor ours instead.
    # r4 binds REPL by value at import, and build_lake reads the r3
    # module global at call time — set both.
    r3.REPL = r4.REPL = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    _main()
