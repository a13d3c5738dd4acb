#!/usr/bin/env python
"""Measure the Python stateful-streaming per-key call floor (r12 verdict
task 5).

The two `applyInPandasWithState` operators (e08, e38) pay a per-key
Python function call + Arrow slice per micro-batch — measured at the
100x grid as 18-30x wall for 100x rows while JVM-native streaming ops
stayed <= 8x. Spark 4's `transformWithStateInPandas` (JVM-managed typed
state, same Python-call shape) is the engine's preferred route when its
protobuf dependency exists; THIS container lacks google.protobuf, so the
TWS side of the comparison is a documented gate, and what this script
measures is the floor a cluster operator needs to size the Python path:

    usec/key/batch = (wall(applyInPandasWithState) - wall(JVM agg))
                     / n_keys * 1e6

over a synthetic K-keys x R-rows/key single-batch drain where the JVM
baseline is the SAME source/sink/drain machinery with a groupBy().agg()
— so the subtraction isolates the per-key Python + Arrow cost from
file-source and sink overhead shared by both.

Usage: python scripts/stateful_floor.py [--keys 10000,100000,1000000]
       [--rows-per-key 1] [--runs 2]
Writes .scale/stateful_floor.json; SCALE.md is the committed summary.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _make_events(spark: SparkSession, n_keys: int, rows_per_key: int,
                 out: str) -> None:
    n = n_keys * rows_per_key
    (
        spark.range(n)
        .select(
            (F.col("id") % n_keys).alias("user_id"),
            F.timestamp_micros(
                F.lit(1_700_000_000_000_000) + F.col("id") * 1_000_000
            ).alias("ts"),
            F.col("id").alias("event_id"),
            (F.col("id") % 997).cast("double").alias("value"),
        )
        .repartition(32)
        .write.mode("overwrite")
        .parquet(out)
    )


def _python_stateful(stream: DataFrame) -> DataFrame:
    """Minimal per-key state: (count, sum) — the smallest honest
    stateful body, so the measurement is the API's call floor, not the
    user function."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        DoubleType, LongType, StructField, StructType,
    )

    state_schema = StructType([
        StructField("n", LongType()), StructField("s", DoubleType()),
    ])
    out_schema = StructType([
        StructField("user_id", LongType()),
        StructField("n", LongType()),
        StructField("s", DoubleType()),
    ])

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        n, s = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            s += float(pdf["value"].sum())
        state.update((n, s))
        yield pd.DataFrame({"user_id": [key[0]], "n": [n], "s": [s]})

    return stream.select("user_id", "ts", "value").groupBy(
        "user_id"
    ).applyInPandasWithState(
        update, out_schema, state_schema, "update",
        GroupStateTimeout.NoTimeout,
    )


def _jvm_agg(stream: DataFrame) -> DataFrame:
    return (
        stream.select("user_id", "ts", "value")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
    )


def _drain(spark: SparkSession, path: str, transform) -> tuple[float, int]:
    from research_data_pipeline_spark.streaming.jobs import (
        _run_stream_to_batch,
    )

    t0 = time.perf_counter()
    out = _run_stream_to_batch(spark, path, transform, "update")
    n = out.count()
    return time.perf_counter() - t0, n


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--keys", default="10000,100000,1000000")
    ap.add_argument("--rows-per-key", type=int, default=1)
    ap.add_argument("--runs", type=int, default=2)
    args = ap.parse_args()
    key_grid = [int(k) for k in args.keys.split(",") if k.strip()]

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    os.chdir(here)

    from research_data_pipeline_spark.session import get_spark
    from research_data_pipeline_spark.streaming.jobs import _tws_available

    spark = get_spark(app="stateful-floor")
    spark.sparkContext.setLogLevel("ERROR")

    doc: dict = {
        "tws_available": _tws_available(),
        "rows_per_key": args.rows_per_key,
        "grid": [],
    }
    for n_keys in key_grid:
        d = tempfile.mkdtemp(prefix="rdp_floor_")
        src = os.path.join(d, "events.parquet")
        try:
            _make_events(spark, n_keys, args.rows_per_key, src)
            walls = {"python_state": [], "jvm_agg": []}
            for _ in range(args.runs):
                w, n = _drain(spark, src, _python_stateful)
                assert n == n_keys, (n, n_keys)
                walls["python_state"].append(w)
                w, n = _drain(spark, src, _jvm_agg)
                assert n == n_keys, (n, n_keys)
                walls["jvm_agg"].append(w)
            py = min(walls["python_state"])
            jvm = min(walls["jvm_agg"])
            row = {
                "n_keys": n_keys,
                "python_state_s": round(py, 2),
                "jvm_agg_s": round(jvm, 2),
                "usec_per_key": round((py - jvm) / n_keys * 1e6, 2),
            }
            doc["grid"].append(row)
            print(json.dumps(row), flush=True)
        finally:
            shutil.rmtree(d, ignore_errors=True)

    os.makedirs(".scale", exist_ok=True)
    with open(".scale/stateful_floor.json", "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps(doc))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
