"""Epoch-straddle robustness (round-11 tenth adversarial sweep): shift
the whole event clock so half the corpus has NEGATIVE unix micros
(pre-1970) with relative order and every gap preserved. The regime where
truncate-toward-zero and floor diverge for time bucketing, and where
Spark Structured Streaming's epoch-0 initial watermark bites. Full
registry state: `scripts/probe_corpus.py epochs`; this file pins the two
fixed queries (e11 bucket floor, e16 oracle week arithmetic) and the
streaming engine bound the remaining four divergences document."""

from __future__ import annotations

import datetime as dt
import os

import pytest

from pyspark.sql import functions as F

from .test_null_inputs import TABLES


@pytest.fixture(scope="module")
def epoch_dir(spark, tmp_path_factory):
    """sf0.001 with events shifted so the clock midpoint lands 150 s
    past epoch zero (NOT a 5-min boundary): ~half the events go
    pre-1970; order and gaps are exactly preserved (same mutation as
    scripts/probe_corpus.py epochs)."""
    d = str(tmp_path_factory.mktemp("epoch_tables"))
    for t in TABLES:
        df = spark.read.parquet(f"/root/testdata/sf0.001/{t}.parquet")
        if t == "events":
            mid = df.selectExpr(
                "CAST((min(unix_micros(CAST(ts AS TIMESTAMP)))"
                " + max(unix_micros(CAST(ts AS TIMESTAMP)))) DIV 2"
                " AS BIGINT) AS m"
            ).first()["m"]
            df = df.withColumn(
                "ts",
                F.timestamp_micros(
                    F.unix_micros(F.col("ts").cast("timestamp"))
                    - F.lit(mid - 150_000_000)
                ).cast("timestamp_ntz"),
            )
        df.write.parquet(f"{d}/{t}.parquet")
    return d


@pytest.mark.parametrize(
    "name", ["e11_multigrain_rollup", "e16_cohort_retention"]
)
def test_epoch_straddle_queries_stay_oracle_exact(spark, epoch_dir, name):
    """e11: the 5-min bucket floors via us - pmod(us, gap) — the old
    CAST(us/gap AS BIGINT) truncated toward zero, putting pre-1970
    events one bucket too high (DuckDB's time_bucket floors; its
    2000-01-03 origin is 300s-aligned, i.e. epoch-equivalent). e16: the
    oracle's date_diff('week', ...) counted truncated epoch-anchored
    boundaries, merging adjacent weeks across 1970; exact division of
    the Monday-aligned week starts matches the engine's arithmetic.
    Both provably identical to the old forms for ts >= 1970."""
    from research_data_pipeline_spark.registry import all_specs

    from .oracle import assert_parity

    spec = all_specs()[name]
    assert_parity(spec.fn(spark, epoch_dir), spec.oracle, epoch_dir, name)


def test_streaming_initial_watermark_is_epoch_zero(spark, tmp_path):
    """The engine bound the epochs-probe streaming divergences document
    (e13/e17/e18/e23): Spark Structured Streaming initializes the
    event-time watermark to epoch 0, so events with PRE-1970 event time
    arrive 'late' in the very first micro-batch and are dropped by every
    watermarked stateful operator — there is no conf to start at -inf.
    Event times must be > epoch 0 + the watermark delay; the batch
    oracles keep such rows, so the four queries are out of the epochs
    probe's parity domain by documented engine semantics, not by bug.
    If a Spark upgrade lifts this, the probe expectation must move."""
    from research_data_pipeline_spark.streaming.jobs import (
        run_session_stream_to_batch,
    )

    rows = [
        (i, dt.datetime(1969, 12, 31, 10, 0) + dt.timedelta(hours=i),
         100 + i, "click", 1.0, "{}")
        for i in range(6)
    ] + [
        (10 + i, dt.datetime(1970, 1, 1, 10, 0) + dt.timedelta(hours=i),
         200 + i, "click", 1.0, "{}")
        for i in range(6)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long,"
        " event_type string, value double, props string",
    )
    p = os.path.join(str(tmp_path), "events.parquet")
    df.coalesce(1).write.parquet(p)

    got = {r["user_id"] for r in run_session_stream_to_batch(spark, p).collect()}
    # hourly gaps > none within 30-min session gap → 12 single-event
    # sessions if nothing were dropped; the 6 pre-epoch users vanish
    assert got == {200 + i for i in range(6)}
