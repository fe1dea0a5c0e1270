"""Round-11 scale probe: 20x rows for this round's one changed batch
plan.

- sparse_cosine_pairs_topk: the df gate changed from an absolute cap
  (vacuous at sf0.1 — round-10 verdict task 2) to a rarity-relative
  max(40, 4*min_df). The probe lake grows documents with a DISJOINT
  per-replica vocabulary (scale_probe_r3.build_lake prefixes every
  word), so per-token df stays constant while the corpus and
  vocabulary grow 20x — exactly the growth pattern under which a
  corpus-fraction cap would have passed the stopword-dense tokens and
  gone quadratic. Linear-ish ratio here certifies the gate keeps
  candidate generation tied to rarity structure, not corpus size.

Usage: python scripts/scale_probe_r11.py [REPL] [query ...]
Default REPL=20. Prints one line per query: name, 1x s, REPLx s, ratio.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import scripts.scale_probe_r3 as r3  # noqa: E402
import scripts.scale_probe_r4 as r4  # noqa: E402
from scripts.scale_probe_r4 import main as _main  # noqa: E402

QUERIES = [
    "sparse_cosine_pairs_topk",
]

if __name__ == "__main__":
    args = sys.argv[1:]
    has_repl = bool(args) and args[0].isdigit() and int(args[0]) > 0
    repl = int(args[0]) if has_repl else 20
    names = args[1:] if has_repl else args
    stray = [a for a in names if a.isdigit()]
    if stray:
        sys.exit(
            f"usage: {sys.argv[0]} [REPL] [query ...] — REPL must be "
            f"argv[1]; got stray numeric args {stray}"
        )
    sys.argv = [sys.argv[0], str(repl)] + names
    r4.QUERIES = QUERIES
    r3.REPL = r4.REPL = repl
    _main()
