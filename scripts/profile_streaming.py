#!/usr/bin/env python
"""Phase-level attribution for the streaming e-family drains (guide §1):
wraps StreamingQuery.processAllAvailable/awaitTermination to capture each
drain's wall time AND the per-micro-batch durationMs breakdown Spark
already records (triggerExecution, queryPlanning, walCommit, addBatch,
getBatch, latestOffset, commitOffsets) — the machinery costs the UI REST
API can't see because streaming batches bypass the SQL tab.

Usage: python scripts/profile_streaming.py e38_streaming_scd2 e23_... ...
       (no args = every registered query that drains a stream)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STREAMING_QUERIES = [
    "e02_streaming_tumbling", "e07_streaming_dedup",
    "e08_stateful_user_stats", "e13_streaming_sessions",
    "e14_stream_static_join", "e17_stream_stream_join",
    "e18_stream_stream_outer_join", "e23_watermark_dedup_replay",
    "e24_record_high_counts", "e30_stream_agg_merge",
    "e38_streaming_scd2",
]


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = sys.argv[1:] or STREAMING_QUERIES

    from pyspark.sql.streaming import query as Q

    drains: list[dict] = []

    orig_paa = Q.StreamingQuery.processAllAvailable
    orig_await = Q.StreamingQuery.awaitTermination

    def grab(self, wall, kind):
        prog = []
        for p in self.recentProgress:
            d = p if isinstance(p, dict) else json.loads(p.json)
            prog.append(
                {
                    "batchId": d.get("batchId"),
                    "numInputRows": d.get("numInputRows"),
                    "durationMs": d.get("durationMs"),
                    "stateOperators": [
                        {
                            "operatorName": so.get("operatorName"),
                            "commitTimeMs": so.get("commitTimeMs"),
                            "numShufflePartitions": so.get("numShufflePartitions"),
                        }
                        for so in d.get("stateOperators", [])
                    ],
                }
            )
        drains.append({"kind": kind, "wall_s": round(wall, 3), "batches": prog})

    def timed_paa(self):
        t0 = time.perf_counter()
        orig_paa(self)
        grab(self, time.perf_counter() - t0, "processAllAvailable")

    def timed_await(self, timeout=None):
        t0 = time.perf_counter()
        r = orig_await(self) if timeout is None else orig_await(self, timeout)
        grab(self, time.perf_counter() - t0, "awaitTermination")
        return r

    Q.StreamingQuery.processAllAvailable = timed_paa
    Q.StreamingQuery.awaitTermination = timed_await

    from research_data_pipeline_spark.registry import all_specs
    from research_data_pipeline_spark.session import get_spark

    spark = get_spark(app="rdp-stream-profile")
    from research_data_pipeline_spark.tables import TPCH_TABLES

    for t in TPCH_TABLES:
        spark.read.parquet(f"{sf_dir}/{t}.parquet").count()

    specs = all_specs()
    n_runs = int(os.environ.get("PROFILE_RUNS", "2"))
    for name in names:
        best = None
        for _ in range(n_runs):
            drains.clear()
            t0 = time.perf_counter()
            df = specs[name].fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            wall = time.perf_counter() - t0
            spark.catalog.clearCache()
            if best is None or wall < best["wall_s"]:
                best = {"wall_s": round(wall, 3), "drains": list(drains)}
        drain_s = sum(d["wall_s"] for d in best["drains"])
        print(f"\n=== {name}: wall {best['wall_s']} s, "
              f"{len(best['drains'])} drain(s) totaling {drain_s:.3f} s, "
              f"non-drain {best['wall_s'] - drain_s:.3f} s")
        for d in best["drains"]:
            print(f"  drain [{d['kind']}] {d['wall_s']} s, "
                  f"{len(d['batches'])} progressed batches")
            for b in d["batches"]:
                dm = b["durationMs"] or {}
                so = "; ".join(
                    f"{x['operatorName']}: commit {x['commitTimeMs']} ms, "
                    f"{x['numShufflePartitions']} parts"
                    for x in b["stateOperators"]
                )
                print(f"    batch {b['batchId']}: rows {b['numInputRows']}, "
                      f"trigger {dm.get('triggerExecution')} ms "
                      f"(addBatch {dm.get('addBatch')}, "
                      f"getBatch {dm.get('getBatch')}, "
                      f"latestOffset {dm.get('latestOffset')}, "
                      f"planning {dm.get('queryPlanning')}, "
                      f"walCommit {dm.get('walCommit')}, "
                      f"commitOffsets {dm.get('commitOffsets')})"
                      + (f" [{so}]" if so else ""))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
