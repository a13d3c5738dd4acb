#!/usr/bin/env python
"""Full-registry DuckDB-oracle parity sweep at sf0.1 (10x the driver's
check scale) — the round-7 discipline, checked in (rounds 7-10 ran it
ad-hoc): every registered query with a tractable oracle runs
side-by-side against its oracle under the driver's sorted-column exact
compare. The skip set is the documented recursive/unrolled-reachability
oracle family — DuckDB-side closure walks that are intractable at
sf0.1 (they all stay green at sf0.01 via tests/test_oracle_parity.py).
g18's recursive-closure oracle is NOT skipped: its top-2 out-degree
bounds reachability, so it stays tractable.

Usage: python scripts/sweep_sf01.py [sf_dir]  (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0,
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"
    ),
)

RECURSIVE_ORACLE_SKIPS = {
    "d19_dedup_clusters", "d41_dedup_savings", "d43_corpus_funnel",
    "d48_quality_canonicals", "d58_leakage_free_split",
    "d68_incremental_clusters", "d71_cluster_conductance",
    "d72_cluster_merge_queue", "g05_connected_components", "g08_bfs_hops",
    "g09_kcore", "g11_weighted_shortest_path", "g16_personalized_pagerank",
    "g17_harmonic_centrality",
}


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from oracle import assert_parity

    from research_data_pipeline_spark.registry import all_specs

    ok = bad = 0
    t_all = time.time()
    for name, spec in sorted(all_specs().items()):
        if name in RECURSIVE_ORACLE_SKIPS or spec.oracle is None:
            continue
        t0 = time.time()
        try:
            assert_parity(spec.fn(spark, sf), spec.oracle, sf, name)
            ok += 1
            print(f"OK   {name} {time.time() - t0:.1f}s", flush=True)
        except Exception as e:
            bad += 1
            print(f"FAIL {name}: {e}", flush=True)
        spark.catalog.clearCache()
    print(
        f"SWEEP DONE ok={ok} fail={bad} wall={time.time() - t_all:.0f}s",
        flush=True,
    )
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
