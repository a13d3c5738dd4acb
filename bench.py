#!/usr/bin/env python
"""Benchmark runner: executes every registered query at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE COMPACT JSON line:

  {"metric": "...", "value": total_sec, "unit": "sec",
   "queries": {<worst-5 only>}, "n_queries": N, "n_failed": 0, "sf": 0.1}

The line is kept small (a few hundred bytes) because the driver captures
only a stdout tail — round 1's full 76-entry per-query map overflowed it
and the head of the line (metric/value) was cut off, leaving
BENCH_r01.json unparseable. The full per-query map goes to
bench_full.json next to this script instead.

Each query is forced through a noop sink so the full plan executes
(a bare count() would let Catalyst prune most of the work).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    from research_data_pipeline_spark.registry import all_specs
    from research_data_pipeline_spark.session import get_spark

    spark = get_spark(app="rdp-bench")
    # JVM + parquet-footer warmup on every input so per-query numbers
    # measure the plans, not first-touch file-index/codegen startup
    from research_data_pipeline_spark.tables import TPCH_TABLES

    for t in TPCH_TABLES:
        spark.read.parquet(f"{sf_dir}/{t}.parquet").count()

    # Shared suite state, timed SEPARATELY and included in the total:
    # d06/d19 share one LSH signature/pair computation (docs._lsh_pair_
    # stream) — a production suite builds that table once. Timing it here
    # keeps the suite total honest: without this line, best-of-2 would
    # attribute the build to nobody (first run pays it, min() discards
    # it) and the total would under-report real wall-clock by the build
    # cost.
    shared: dict[str, float] = {}
    # wall-clock window of each shared build (epoch seconds) — drift
    # attribution: if a driver run shows >2x on the docs/similarity
    # family, these windows prove whether an artifact build overlapped
    # the drifting queries' measurements (r09 verdict task 7)
    shared_ts: dict[str, list[float]] = {}
    from research_data_pipeline_spark.queries.docs import (
        _lsh_pair_stream,
        _PAIR_STREAM_CACHE,
    )

    _PAIR_STREAM_CACHE.clear()
    shared_ts["lsh_pair_stream"] = [time.time()]
    t0 = time.perf_counter()
    _lsh_pair_stream(spark, sf_dir)
    shared["lsh_pair_stream"] = round(time.perf_counter() - t0, 3)
    shared_ts["lsh_pair_stream"].append(time.time())

    # d38/d54 share the iterated-BPE encode table the same way
    from research_data_pipeline_spark.queries.docs import (
        _bpe_enc_table,
        _BPE_ENC_CACHE,
    )

    _BPE_ENC_CACHE.clear()
    shared_ts["bpe_enc_table"] = [time.time()]
    t0 = time.perf_counter()
    _bpe_enc_table(spark, sf_dir)
    shared["bpe_enc_table"] = round(time.perf_counter() - t0, 3)
    shared_ts["bpe_enc_table"].append(time.time())

    # d19/d41/d43/d48/d58 share the resolved cluster-canonical table
    # (built from the pair stream above, so this times only the CC
    # resolution + materialization)
    from research_data_pipeline_spark.queries.docs import (
        _cluster_table,
        _CLUSTER_CACHE,
    )

    _CLUSTER_CACHE.clear()
    shared_ts["cluster_table"] = [time.time()]
    t0 = time.perf_counter()
    _cluster_table(spark, sf_dir)
    shared["cluster_table"] = round(time.perf_counter() - t0, 3)
    shared_ts["cluster_table"].append(time.time())

    # d63/d64 share the materialized seed-centroid IVF assignment table
    # (one Arrow pass per session/dataset)
    from research_data_pipeline_spark.queries.docs import (
        _ivf_assign_table,
        _IVF_ASSIGN_CACHE,
    )

    _IVF_ASSIGN_CACHE.clear()
    shared_ts["ivf_assign_table"] = [time.time()]
    t0 = time.perf_counter()
    _ivf_assign_table(spark, sf_dir)
    shared["ivf_assign_table"] = round(time.perf_counter() - t0, 3)
    shared_ts["ivf_assign_table"].append(time.time())

    # q43/q44/q47 share the five-key hot-key skew stats (one
    # map-side-combined groupBy per key, measured once per
    # session/dataset; the salting guards read the dict)
    from research_data_pipeline_spark.queries.relational import (
        _SKEW_STATS_CACHE,
        _skew_stats_bulk,
        _skew_store_path,
    )

    # the durable skew store is rebuilt from scratch every run, exactly
    # like the bucketed authorship store below: measurement cost is
    # charged to this shared line each round, never amortized across runs
    from research_data_pipeline_spark.io import fs as _fs0

    _fs0.delete(spark, _skew_store_path(sf_dir))
    _SKEW_STATS_CACHE.clear()
    shared_ts["skew_stats"] = [time.time()]
    t0 = time.perf_counter()
    _skew_stats_bulk(spark, sf_dir)
    shared["skew_stats"] = round(time.perf_counter() - t0, 3)
    shared_ts["skew_stats"].append(time.time())

    # dwh1-dwh4 share the durable bucketed authorship store (r13,
    # io.layout): the production layout decision measured at sf10 (dwh3
    # 9.1x, SCALE.md round-12) — star_tables probes for it, so building
    # it here flips all four star queries to the exchange-elided plan
    # exactly as a production suite would. Deleted and rebuilt from
    # scratch EVERY run so the durable store can't make run N+1's
    # accounting differ from run N's (the build cost is this shared
    # line, every round, not a one-time hidden subsidy).
    from research_data_pipeline_spark.io import fs as _fs
    from research_data_pipeline_spark.io.layout import (
        bucketed_authorship_path,
        build_bucketed_authorship,
    )

    _fs.delete(spark, bucketed_authorship_path(sf_dir))
    shared_ts["bucketed_authorship"] = [time.time()]
    t0 = time.perf_counter()
    build_bucketed_authorship(spark, sf_dir)
    shared["bucketed_authorship"] = round(time.perf_counter() - t0, 3)
    shared_ts["bucketed_authorship"].append(time.time())

    # g05-g17 (12 graph queries) + q08/q16 share the weighted co-supplier
    # edge table (graph_analytics._co_edge_table) — one 2-exchange build
    # per session/dataset, memoized exactly like the LSH pair stream
    # above; cleared and rebuilt here so the build cost is charged to
    # every run, never silently amortized away.
    from research_data_pipeline_spark.queries.graph_analytics import (
        _CO_EDGE_CACHE,
        _co_edge_table,
    )

    _CO_EDGE_CACHE.clear()
    shared_ts["cosupplier_edges"] = [time.time()]
    t0 = time.perf_counter()
    _co_edge_table(spark, sf_dir)
    shared["cosupplier_edges"] = round(time.perf_counter() - t0, 3)
    shared_ts["cosupplier_edges"].append(time.time())

    # Best-of-2 per query: a transient load spike or first-touch codegen
    # compile can inflate a single run 2-4x (round 3's "regression" was
    # exactly that — 7 unchanged queries drifted 2-4x on a loaded
    # machine). The min of two runs measures the plan, not the weather;
    # per-query spread goes to bench_full.json so noise is visible.
    n_runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2"))
    timings: dict[str, float] = {}
    spreads: dict[str, float] = {}
    specs = all_specs()
    for name, spec in sorted(specs.items()):
        runs: list[float] = []
        for _ in range(n_runs):
            t0 = time.perf_counter()
            try:
                df = spec.fn(spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
                runs.append(round(time.perf_counter() - t0, 3))
            except Exception as ex:  # a failing query must not hide the rest
                runs = []
                print(f"bench: {name} failed: {ex}", file=sys.stderr)
                break
            # isolation: a query's own caches count inside its timing; they
            # must not linger to pressure the heap of queries after it
            spark.catalog.clearCache()
        timings[name] = min(runs) if runs else -1.0
        spreads[name] = round(max(runs) - min(runs), 3) if runs else -1.0
        spark.catalog.clearCache()

    full_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_full.json")
    # Regression gate: any query whose best-of-n worsens >1.5x vs the
    # previous bench_full.json with LOW spread (< 0.5 s — i.e. the slow
    # number is reproducible, not one noisy run) marks the run failed.
    # Intentional plan changes re-baseline automatically because this
    # file is overwritten below.
    regressions: dict[str, list[float]] = {}
    prev: dict[str, float] = {}
    try:
        with open(full_path) as f:
            prev_doc = json.load(f)
        # only compare like-for-like scale factors — a dev run at sf0.01
        # must not become the baseline for the driver's sf0.1 run
        prev = prev_doc.get("queries", {}) if prev_doc.get("sf") == sf else {}
        prev_spread = (
            prev_doc.get("spread", {}) if prev_doc.get("sf") == sf else {}
        )

        def _allow(n: str, p: float) -> float:
            # the baseline's own recorded spread raises the bar, but
            # CAPPED (r13 advisor): after a retry-confirmed regression
            # spreads[n] stores the regression delta itself, and one
            # noisy round must not inflate the next round's bar into
            # uselessness — allow at most half the baseline best, never
            # more than 1.0 s
            s = max(prev_spread.get(n, 0.0), 0.0)
            return 0.25 + min(s, 0.5 * p, 1.0)

        for n, t in timings.items():
            p = prev.get(n, -1.0)
            # absolute floor: a sub-quarter-second delta on a tiny query
            # (e.g. 0.08 s -> 0.13 s) is scheduler noise, not a plan change.
            # The baseline's own recorded spread also raises the bar: a
            # best-of-2 baseline that landed on a fast outlier (r13: q36
            # best 0.416 with 0.295 spread, history ~0.62) would otherwise
            # flag every honest later run — if the baseline's two runs
            # disagreed by X, a later run within p + X + 0.25 is inside
            # the baseline's OWN noise, not a regression.
            if (
                p > 0
                and t > 1.5 * p
                and t - p > _allow(n, p)
                and spreads.get(n, 99.0) < 0.5
            ):
                regressions[n] = [p, t]
        # Retry pass: a host-load spike lasting a few seconds can slow
        # BOTH of a short query's back-to-back runs (round 5: d29 went
        # 0.60 s -> [1.31, 1.53] with no code change; isolated reruns
        # measured 0.58-0.72 s). Re-run each flagged query now — minutes
        # later in suite time — and clear the flag if the fresh min no
        # longer trips the threshold. A real plan regression reproduces;
        # a transient spike does not.
        for n in list(regressions):
            p = regressions[n][0]
            retry = []
            for _ in range(2):
                t0 = time.perf_counter()
                try:
                    specs[n].fn(spark, sf_dir).write.format("noop").mode(
                        "overwrite"
                    ).save()
                    retry.append(round(time.perf_counter() - t0, 3))
                except Exception:
                    break
                spark.catalog.clearCache()
            best = min(retry, default=99.0)
            bar = _allow(n, p)
            if retry and not (best > 1.5 * p and best - p > bar):
                timings[n] = min(timings[n], best)
                spreads[n] = round(
                    max(regressions[n][1], best) - min(timings[n], best), 3
                )
                del regressions[n]
    except (OSError, ValueError):
        pass
    total = round(
        sum(t for t in timings.values() if t >= 0) + sum(shared.values()), 3
    )
    # Round-over-round comparison computed IN-BENCH over the full
    # per-query map (r14 verdict: the driver's PERF geomean came from the
    # worst-5 overlap only — n_common was 1 of 228; emitting the full-map
    # stats in the one-line JSON makes the round-over-round signal
    # per-query-complete without growing the line past the stdout tail).
    import math

    common = [
        (p, t)
        for n, t in timings.items()
        if t > 0 and (p := prev.get(n, -1.0)) > 0
    ]
    cmp_stats = {
        "n_common": len(common),
        "n_improved": sum(1 for p, t in common if t < p / 1.1),
        "n_slower": sum(1 for p, t in common if t > 1.1 * p),
        "geomean_speedup": (
            round(
                math.exp(sum(math.log(p / t) for p, t in common) / len(common)),
                3,
            )
            if common
            else None
        ),
    }
    failed = sorted(n for n, t in timings.items() if t < 0)
    worst5 = dict(
        sorted(
            ((n, t) for n, t in timings.items() if t >= 0),
            key=lambda kv: -kv[1],
        )[:5]
    )
    with open(full_path, "w") as f:
        json.dump(
            {
                "total_sec": total,
                "sf": sf,
                "failed": failed,
                "runs_per_query": n_runs,
                "timing": "best-of-n per query; spread = max-min across runs",
                "shared": shared,
                "shared_ts": shared_ts,
                "regressions": regressions,
                "queries": timings,
                "spread": spreads,
            },
            f,
            indent=1,
        )
    print(
        json.dumps(
            {
                "metric": "full-suite wall-clock (noop sink)",
                "value": total,
                "unit": "sec",
                "queries": worst5,
                "n_queries": len(timings),
                "n_failed": len(failed),
                "n_regressed": len(regressions),
                **cmp_stats,
                "sf": sf,
            },
            separators=(",", ":"),
        )
    )
    if regressions:
        print(f"bench: REGRESSION GATE: {regressions}", file=sys.stderr)
    spark.stop()
    return 1 if failed or regressions else 0


if __name__ == "__main__":
    raise SystemExit(main())
