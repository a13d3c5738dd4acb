"""Skew guards: the per-user kernels and the salted join must survive a
pathological key — one user holding 10⁶ of the events (VERDICT r1 #9)."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from research_data_pipeline_spark.operators.skew import salted_join
from research_data_pipeline_spark.queries.events import ewma_per_user

HOT = 7
N_HOT = 1_000_000


def _skewed_events(spark):
    """10⁶ events for user 7 plus 3 small users."""
    hot = spark.range(N_HOT).select(
        F.lit(HOT).cast("bigint").alias("user_id"),
        F.col("id").alias("event_id"),
        F.timestamp_seconds(F.col("id")).alias("ts"),
        (F.col("id") % 10).cast("double").alias("value"),
    )
    cold = spark.range(3).select(
        (F.col("id") + 100).alias("user_id"),
        (F.col("id") + N_HOT).alias("event_id"),
        F.timestamp_seconds(F.col("id")).alias("ts"),
        F.lit(5.0).alias("value"),
    )
    return hot.unionByName(cold)


def test_ewma_single_hot_user_million_events(spark):
    t0 = time.perf_counter()
    rows = {r["user_id"]: r for r in ewma_per_user(_skewed_events(spark)).collect()}
    elapsed = time.perf_counter() - t0
    assert rows[HOT]["n_events"] == N_HOT
    acc = 0.0  # same fold, driver-side
    for i in range(N_HOT):
        x = float(i % 10)
        acc = x if i == 0 else 0.7 * acc + 0.3 * x
    assert rows[HOT]["ewma"] == acc
    assert rows[100]["ewma"] == 5.0 and rows[100]["n_events"] == 1
    # completes in task-scale time, not stuck behind a single straggler
    assert elapsed < 120, elapsed


def test_salted_join_correct_under_hot_key(spark):
    big = _skewed_events(spark).select("user_id", "event_id")
    dim = spark.createDataFrame(
        [(HOT, "hot"), (100, "a"), (101, "b"), (102, "c")], "user_id bigint, tag string"
    )
    out = salted_join(big, dim, "user_id", n_salts=8)
    agg = {r["tag"]: r["n"] for r in out.groupBy("tag").agg(F.count("*").alias("n")).collect()}
    assert agg == {"hot": N_HOT, "a": 1, "b": 1, "c": 1}
