"""Round-6 scale probe: adds the 50x tier the round-5 verdict asked for.

Same replica-lake builder as rounds 3-5 (shifted keys => REPLx groups,
REPLx vocabulary). Two jobs:

1. 50x tier for the top-cost family (round-5 verdict task 4): the
   100 TB design claims extrapolated from 20x; one more octave catches
   curvature the 20x point can't.
2. 20x certification of this round's rewrite
   (lm_stupid_backoff_trigram: n-gram shuffle keys dictionary-encoded
   to xxhash64 longs; round-5 measured 10.0x on string keys, done
   criterion <= 5x).

Usage: python scripts/scale_probe_r6.py [REPL] [query ...]
Default REPL=50, default query list below. Prints one line per query:
name, 1x seconds, REPLx seconds, ratio.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import scripts.scale_probe_r3 as r3  # noqa: E402
import scripts.scale_probe_r4 as r4  # noqa: E402
from scripts.scale_probe_r4 import main as _main  # noqa: E402

QUERIES = [
    # 50x tier: the five most expensive round-5 queries + the landmark
    # inverted-index op whose 20x ratio was volume-bound
    "dedup_simhash",
    "graph_hits_hubs_authorities",
    "linkage_symspell_edit1",
    "robust_theil_sen_slope",
    "graph_random_walk_deterministic",
    "mm_audio_constellation_match",
    # round-6 rewrite (also re-run at 20x for the done-criterion)
    "lm_stupid_backoff_trigram",
]

if __name__ == "__main__":
    r4.QUERIES = QUERIES
    # scale_probe_r3 parsed ITS argv at import; honor ours instead.
    # r4 binds REPL by value at import, and build_lake reads the r3
    # module global at call time — set both.
    r3.REPL = r4.REPL = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    _main()
