"""Watermark semantics: late rows below the watermark are dropped from
streaming aggregations — the state-bounding behavior the 100 TB posture
relies on, verified end-to-end with an actual two-batch streaming run.
"""

from __future__ import annotations

import datetime as dt
import tempfile
import uuid

from pyspark.sql import functions as F


def _write_events(spark, path, rows):
    spark.createDataFrame(
        [(i, ts, 1) for i, ts in enumerate(rows)], "event_id int, ts timestamp, n int"
    ).coalesce(1).write.mode("append").parquet(path)


def test_watermark_drops_late_rows(spark, tmp_path):
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    src = str(tmp_path / "src")
    # batch 1: two on-time events advance the watermark to 12:59
    _write_events(spark, src, [t0, t0 + dt.timedelta(hours=1)])

    name = f"wm_{uuid.uuid4().hex[:8]}"
    stream = spark.readStream.schema("event_id int, ts timestamp, n int").option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    agg = (
        stream.withWatermark("ts", "1 minute")
        .groupBy(F.window("ts", "10 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("start"), "n")
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="wm_ckpt_"))
        .start()
    )
    try:
        q.processAllAvailable()
        # batch 2: one event far below the watermark (12:00 window already
        # finalized and emitted) and one new on-time event
        _write_events(
            spark, src, [t0 + dt.timedelta(minutes=1), t0 + dt.timedelta(hours=2)]
        )
        q.processAllAvailable()
        rows = {r["start"]: r["n"] for r in spark.table(name).collect()}
    finally:
        q.stop()

    # the 12:00 window was emitted with ONLY the on-time event; the late
    # arrival (12:01, below the 12:59 watermark) was dropped, not merged
    assert rows[t0] == 1


def test_stream_lands_in_date_partitions(spark, sf_dir, tmp_path):
    import os

    from research_data_pipeline_spark.streaming.jobs import (
        run_stream_to_partitioned_parquet,
    )

    dest = str(tmp_path / "landing")
    run_stream_to_partitioned_parquet(spark, f"{sf_dir}/events.parquet", dest)
    back = spark.read.parquet(dest)
    from research_data_pipeline_spark.tables import load

    assert back.count() == load(spark, sf_dir, "events").count()
    assert any(d.startswith("event_date=") for d in os.listdir(dest))
    # date filters prune at the directory level
    one_day = back.where(F.col("event_date") == back.select("event_date").first()[0])
    assert one_day.count() > 0


def test_watermark_dedup_replay_shows_both_behaviors(spark, sf_dir):
    """The watermark-scoped dedup must exhibit BOTH production behaviors
    on the fixture: replayed keys inside the state horizon dedup
    (n_emits=1), keys past it re-emit after eviction (n_emits=2) — and
    nothing emits more than twice."""
    from research_data_pipeline_spark.streaming.jobs import (
        run_watermark_dedup_replay,
    )
    from pyspark.sql import functions as F

    out = run_watermark_dedup_replay(spark, f"{sf_dir}/events.parquet")
    counts = {r.n_emits: r.n for r in
              out.groupBy("n_emits").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert counts.get(2, 0) > 0, "no eviction re-emission observed"
    assert counts.get(1, 0) > 0
    assert set(counts) == {1, 2}
    # every event_id of the fixture appears (first arrivals always emit)
    n_ids = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id").distinct().count()
    assert out.count() == n_ids


def test_fold_state_batch_marker_commits_atomically_with_state(spark, tmp_path):
    """e30's replay idempotence (advisor round-6): the applied-batch
    marker rides INSIDE the atomically-swapped state directory, so state
    content and skip decision can never disagree — a replayed batch is a
    no-op, and there is no crash window between 'state swapped' and
    'batch id recorded'."""
    import json
    import os

    from research_data_pipeline_spark.streaming.jobs import (
        _STATE_MARKER,
        _fold_state_batch,
    )

    D = "decimal(12,4)"
    state_dir = str(tmp_path / "state")

    def part(rows):
        return spark.createDataFrame(
            rows, "user_id int, cnt bigint, mn double, mx double, sum_raw double"
        ).select(
            "user_id", "cnt", F.col("sum_raw").cast(D).alias("sum_dec"),
            "mn", "mx",
        )

    assert _fold_state_batch(state_dir, part([(1, 2, 1.0, 3.0, 4.0)]), 0)
    marker = json.load(open(os.path.join(state_dir, _STATE_MARKER)))
    assert marker == {"last_batch_id": 0}
    # the marker file is parquet-invisible: reading the dir sees state rows
    assert spark.read.parquet(state_dir).count() == 1

    # replay of batch 0 is a committed no-op — same rows, same marker
    assert not _fold_state_batch(state_dir, part([(1, 2, 1.0, 3.0, 4.0)]), 0)
    row = spark.read.parquet(state_dir).collect()[0]
    assert (row["cnt"], float(row["sum_dec"])) == (2, 4.0)

    # a NEW batch folds in and advances the marker in the same swap
    assert _fold_state_batch(state_dir, part([(1, 1, 0.5, 9.0, 2.0)]), 1)
    marker = json.load(open(os.path.join(state_dir, _STATE_MARKER)))
    assert marker == {"last_batch_id": 1}
    row = spark.read.parquet(state_dir).collect()[0]
    assert (row["cnt"], float(row["sum_dec"]), row["mn"], row["mx"]) == (
        3, 6.0, 0.5, 9.0,
    )


def test_scd2_versions_survive_the_batch_boundary(spark, sf_dir):
    # the two-real-batch drain is only a meaningful test of stateful SCD2
    # if versions actually straddle the midpoint split: at least one
    # completed interval must open before the midpoint and close at or
    # after it (i.e. it was opened in micro-batch 1 and closed against
    # CARRIED STATE in micro-batch 2, not batch-local data)
    from research_data_pipeline_spark.streaming.jobs import (
        run_scd2_stream_to_batch,
    )
    from research_data_pipeline_spark.tables import epoch_us, load

    ev = load(spark, sf_dir, "events")
    us = epoch_us(F.col("ts"))
    mn, mx = ev.agg(F.min(us), F.max(us)).first()
    mid = (mn + mx) // 2
    out = run_scd2_stream_to_batch(spark, f"{sf_dir}/events.parquet")
    straddlers = out.where(
        (F.col("valid_from_us") < mid)
        & F.col("valid_to_us").isNotNull()
        & (F.col("valid_to_us") >= mid)
    ).count()
    assert straddlers > 0
    # and open versions were flushed exactly once per user
    opens = out.where(F.col("is_current")).groupBy("user_id").count()
    assert opens.where(F.col("count") > 1).count() == 0


def test_record_breaks_full_population_matches_batch_window(spark, sf_dir):
    """The registered e24 artifact drains a 20% user sample (per-key
    Python call cost — see the registration comment); THIS pins the
    full-population operator against the batch running-max window on
    every user, so the sampling is an artifact-size decision only."""
    from research_data_pipeline_spark.streaming.jobs import (
        run_record_breaks_to_batch,
    )

    from .oracle import assert_parity

    full_oracle = """
        WITH w AS (
            SELECT user_id, value,
                   MAX(value) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ) AS prev_max
            FROM events
            WHERE value IS NOT NULL AND NOT isnan(value)
        )
        SELECT user_id,
               CAST(COUNT(*) FILTER (WHERE prev_max IS NULL
                                        OR value > prev_max)
                    AS BIGINT) AS n_records,
               MAX(value) AS max_value
        FROM w GROUP BY user_id
    """
    got = run_record_breaks_to_batch(spark, f"{sf_dir}/events.parquet")
    assert_parity(got, full_oracle, sf_dir, "e24-full-population")
