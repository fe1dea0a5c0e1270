"""Round-5 20x scale probe.

Same replica-lake builder as rounds 3/4 (shifted keys => 20x groups,
20x vocabulary). Query list per the round-4 verdict task 6 — the
round-4 newcomers scale_probe_r4 never covered — plus the round-5
rewrites whose ratios must be re-certified:

- ml_isotonic_calibration: PAVA via iterated min-struct — global-order
  dependent, the probe checks the iteration count doesn't scale with n;
- granger_lag_causality: per-series lag windows — per-key growth;
- geo_point_in_polygon: per-row x per-vertex HOF — polygon-count bound;
- xicor_correlation / bradley_terry_one_step /
  dedup_cluster_quality_representative: the three bench-noise-suspect
  queries from the round-4 regression bisect (isolated-session times
  matched r3; the probe pins their data-scaling so future bench noise
  can be distinguished from real regressions);
- ngram_draft_acceptance_rate / dedup_minhash_lsh / dedup_simhash /
  intra_doc_segment_dedup: round-5 rewrites (argmax partial-agg,
  shared cert slice, projected-token HOFs).

Usage: python scripts/scale_probe_r5.py [REPL] [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.scale_probe_r4 import main as _main  # noqa: E402
import scripts.scale_probe_r4 as r4  # noqa: E402

QUERIES = [
    "ml_isotonic_calibration",
    "granger_lag_causality",
    "geo_point_in_polygon",
    "xicor_correlation",
    "bradley_terry_one_step",
    "dedup_cluster_quality_representative",
    "ngram_draft_acceptance_rate",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "intra_doc_segment_dedup",
]

if __name__ == "__main__":
    r4.QUERIES = QUERIES
    _main()
