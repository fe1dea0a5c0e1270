"""Round-4 20x scale probe.

Same lake builder as round 3 (imported — replicas with shifted keys so
group/key/vocabulary structure scales the way real growth would), new
query list:

- the two dictionary-encoded text ops (round-3 verdict task 2): were
  20.8x / 5.8x at 20x on string shuffles; long keys should improve both;
- the bounded dedup certificates (tasks 1/4): dedup_minhash_lsh's r3
  ratio was 3.3x with the exhaustive certificate — the sampled
  certificate should land below ~2x; dedup_simhash is newly certified;
- the structure-dependent heavy families the r3 probe never covered
  (task 5): semdedup, containment overlap, the CC-loop cluster ops,
  the iterative graph loops, and the bucketized interval join.

Usage: python scripts/scale_probe_r4.py [REPL] [query ...]  (default 20, all)
Prints one line per query: name, 1x seconds, REPLx seconds, ratio.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.scale_probe_r3 import REPL, SF, build_lake  # noqa: E402

from spark_streaming_practicum_spark.functions.ranks import (  # noqa: E402
    release_persisted_frames,
)
from spark_streaming_practicum_spark.registry import all_queries  # noqa: E402
from spark_streaming_practicum_spark.session import build_session  # noqa: E402

QUERIES = [
    # task 2: dictionary-encoded shuffles
    "ngram_draft_acceptance_rate",
    "curriculum_perplexity_stages",
    # tasks 1/4: bounded certificates
    "dedup_minhash_lsh",
    "dedup_simhash",
    # task 5: structure-dependent families
    "semdedup_cluster_prune",
    "dedup_containment_overlap",
    "dedup_cluster_representatives",
    "dedup_cluster_quality_representative",
    "graph_pagerank_trade",
    "graph_topo_layers",
    "graph_kcore_peel",
    "interval_overlap_join_bucketized",
]


def main() -> None:
    spark = build_session(app_name="scale-probe-r4")
    defs = all_queries()
    wanted = sys.argv[2:] or QUERIES
    out = tempfile.mkdtemp(prefix="ssp_probe_")
    try:
        build_lake(spark, out)
        print(f"lake built at {out} (x{REPL})", flush=True)
        for name in wanted:
            times = {}
            for label, sf_dir in (("1x", SF), (f"{REPL}x", out)):
                t0 = time.perf_counter()
                defs[name].fn(spark, sf_dir).write.mode("overwrite").format(
                    "noop"
                ).save()
                times[label] = time.perf_counter() - t0
                spark.catalog.clearCache()
                release_persisted_frames()
            r = times[f"{REPL}x"] / times["1x"]
            print(
                f"{name:38s} 1x={times['1x']:6.2f}s {REPL}x={times[f'{REPL}x']:7.2f}s"
                f"  ratio={r:5.1f}",
                flush=True,
            )
    finally:
        shutil.rmtree(out, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
