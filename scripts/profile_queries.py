#!/usr/bin/env python
"""Per-query empirical profile (optimization guide §1): run named queries
through the noop sink on an idle box and attribute wall-clock to Spark
jobs/stages/tasks via the UI REST API (enabled here only; bench.py keeps
the UI off).

For each query: wall seconds (best of N), number of Spark jobs the query
launched (actions + eager materializations), number of stages and tasks,
summed executor task time, and shuffle read/write bytes. A query whose
wall >> task time is overhead-bound (scheduling, planning, Python
round-trips, streaming machinery), not compute-bound — the two need
different levers.

Usage: python scripts/profile_queries.py q01_pricing_summary d59_minhash_calibration ...
       python scripts/profile_queries.py --top 25      # worst N from bench_full.json
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

UI_PORT = 4047


def _api(path: str):
    with urllib.request.urlopen(f"http://localhost:{UI_PORT}/api/v1/{path}") as r:
        return json.load(r)


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = sys.argv[1:]
    n_runs = int(os.environ.get("PROFILE_RUNS", "2"))

    from research_data_pipeline_spark.registry import all_specs

    specs = all_specs()
    if names and names[0] == "--top":
        k = int(names[1])
        with open(os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), "bench_full.json")) as f:
            full = json.load(f)["queries"]
        names = [n for n, _ in sorted(full.items(), key=lambda kv: -kv[1])[:k]]
    unknown = [n for n in names if n not in specs]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        return 2

    from pyspark.sql import SparkSession

    from research_data_pipeline_spark.session import RUNTIME_CONFS

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("rdp-profile")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", str(UI_PORT))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    )
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    app_id = spark.sparkContext.applicationId

    from research_data_pipeline_spark.tables import TPCH_TABLES

    for t in TPCH_TABLES:
        spark.read.parquet(f"{sf_dir}/{t}.parquet").count()

    rows = []
    for name in names:
        spec = specs[name]
        best = None
        for _ in range(n_runs):
            jobs_before = {j["jobId"] for j in _api(f"applications/{app_id}/jobs")}
            t0 = time.perf_counter()
            spark.sparkContext.setJobDescription(name)
            df = spec.fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            wall = time.perf_counter() - t0
            spark.sparkContext.setJobDescription(None)
            jobs = [j for j in _api(f"applications/{app_id}/jobs")
                    if j["jobId"] not in jobs_before]
            n_stages = sum(j["numCompletedStages"] + j.get("numSkippedStages", 0)
                           for j in jobs)
            n_tasks = sum(j["numCompletedTasks"] for j in jobs)
            stages = _api(f"applications/{app_id}/stages?status=complete")
            sids = {sid for j in jobs for sid in j["stageIds"]}
            sel = [s for s in stages if s["stageId"] in sids]
            task_time = sum(s["executorRunTime"] for s in sel) / 1000.0
            sh_r = sum(s["shuffleReadBytes"] for s in sel)
            sh_w = sum(s["shuffleWriteBytes"] for s in sel)
            cur = dict(name=name, wall=wall, n_jobs=len(jobs), n_stages=n_stages,
                       n_tasks=n_tasks, task_time=task_time, sh_read=sh_r,
                       sh_write=sh_w)
            if best is None or cur["wall"] < best["wall"]:
                best = cur
            spark.catalog.clearCache()
        rows.append(best)
        print(f"{name:44s} wall={best['wall']:6.2f}s jobs={best['n_jobs']:3d} "
              f"stages={best['n_stages']:3d} tasks={best['n_tasks']:5d} "
              f"taskTime={best['task_time']:7.1f}s "
              f"shR={best['sh_read']>>10:7d}K shW={best['sh_write']>>10:7d}K",
              flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
