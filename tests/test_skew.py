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


def test_maybe_salted_agg_flips_on_measured_skew(spark):
    """The acting guard (verdict r7 #6): the same aggregation spec runs
    the plain single-shuffle plan on a uniform key and flips to the
    two-phase salted reduction on a 10×-hot key — with identical results
    both ways, the decision recorded, and the plan shape proving the
    flip (salted path has a two-level aggregate on (keys, _salt))."""
    from research_data_pipeline_spark.io.layout import formatted_plan
    from research_data_pipeline_spark.operators.decisions import LAST
    from research_data_pipeline_spark.operators.skew import (
        maybe_salted_agg,
        measured_skew_ppm,
    )

    aggs = [("value", "sum", "total"), ("value", "count", "n"),
            ("value", "max", "v_max")]

    uniform = spark.range(4000).select(
        (F.col("id") % 40).alias("user_id"),
        (F.col("id") % 13).cast("double").alias("value"),
    )
    exp0 = [float(40 * k % 13) for k in range(100)]  # user 0's values
    # 1 hot user with 100k rows + 100 cold users with 10 each:
    # skew_ppm = 100000·101·10⁶ div 101000 ≈ 10⁸ ≫ the 10⁷ threshold
    hot = spark.range(100_000).select(
        F.lit(HOT).cast("bigint").alias("user_id"),
        (F.col("id") % 13).cast("double").alias("value"),
    )
    cold = spark.range(1000).select(
        (F.col("id") % 100 + 100).alias("user_id"),
        (F.col("id") % 13).cast("double").alias("value"),
    )
    skewed = hot.unionByName(cold)

    # uniform: exactly 100 rows per key -> ppm == 1e6, plain path
    plain = maybe_salted_agg(uniform, ["user_id"], aggs)
    assert LAST["maybe_salted_agg"]["path"] == "plain"
    assert LAST["maybe_salted_agg"]["skew_ppm"] == 1_000_000
    assert "_salt" not in formatted_plan(plain)
    got_plain = {r["user_id"]: (r["total"], r["n"], r["v_max"])
                 for r in plain.collect()}
    assert got_plain[0] == (sum(exp0), 100, max(exp0))

    # skewed: guard flips; forced-plain and salted results are identical
    assert measured_skew_ppm(skewed, ["user_id"]) >= 10_000_000
    salted = maybe_salted_agg(skewed, ["user_id"], aggs)
    assert LAST["maybe_salted_agg"]["path"] == "salted"
    assert "_salt" in formatted_plan(salted)
    baseline = maybe_salted_agg(
        skewed, ["user_id"], aggs, skew_ppm=1_000_000
    )  # caller-supplied audit number short-circuits measurement
    assert LAST["maybe_salted_agg"]["path"] == "plain"
    got_s = {tuple(r) for r in salted.collect()}
    got_b = {tuple(r) for r in baseline.collect()}
    assert got_s == got_b and len(got_s) == 101


def test_maybe_salted_join_flips_on_measured_skew(spark):
    """The join twin of the acting guard (verdict r8 #5): the same join
    spec runs the plain equi-join on a uniform key and flips to the
    salted scatter join on a 10×-hot key — identical results both ways,
    decision recorded, plan shape proving the flip."""
    from research_data_pipeline_spark.io.layout import formatted_plan
    from research_data_pipeline_spark.operators.decisions import LAST
    from research_data_pipeline_spark.operators.skew import (
        maybe_salted_join,
    )

    dim = spark.createDataFrame(
        [(k, f"tag{k}") for k in [HOT] + [100, 101, 102]],
        "user_id bigint, tag string",
    )

    # uniform: 100 rows for each of users 100-102 -> ppm ~ 1e6, plain
    uniform = spark.range(300).select(
        (F.col("id") % 3 + 100).alias("user_id"),
        F.col("id").alias("event_id"),
    )
    plain = maybe_salted_join(uniform, dim, "user_id")
    assert LAST["maybe_salted_join"]["path"] == "plain"
    assert LAST["maybe_salted_join"]["skew_ppm"] == 1_000_000
    assert "_salt" not in formatted_plan(plain)
    got = {r["tag"]: 1 for r in plain.select("tag").distinct().collect()}
    assert set(got) == {"tag100", "tag101", "tag102"}

    # skewed: 100k rows for HOT + 10 each for 100 cold users -> flips
    hot = spark.range(100_000).select(
        F.lit(HOT).cast("bigint").alias("user_id"),
        F.col("id").alias("event_id"),
    )
    cold = spark.range(1000).select(
        (F.col("id") % 100 + 100).alias("user_id"),
        (F.col("id") + 200_000).alias("event_id"),
    )
    skewed = hot.unionByName(cold)
    salted = maybe_salted_join(skewed, dim, "user_id")
    assert LAST["maybe_salted_join"]["path"] == "salted"
    assert "_salt" in formatted_plan(salted)
    baseline = maybe_salted_join(skewed, dim, "user_id", skew_ppm=1_000_000)
    assert LAST["maybe_salted_join"]["path"] == "plain"
    got_s = {tuple(r) for r in salted.collect()}
    got_b = {tuple(r) for r in baseline.collect()}
    assert got_s == got_b
    n_hot = sum(1 for t in got_s if t[0] == HOT)
    assert n_hot == 100_000 and len(got_s) == 100_030


def test_guarded_queries_read_cached_skew_stats(spark):
    """r09 verdict amortization: q44/q47 must READ the per-session skew
    stats artifact, never re-measure when it is warm. Proof: plant a
    sentinel ppm in the cache and watch the guard's decision carry it
    (and flip to salted on uniform data) — only a dict read can see the
    sentinel. Results stay identical because salting is execution-only."""
    from research_data_pipeline_spark.operators.decisions import LAST
    from research_data_pipeline_spark.queries.relational import (
        _SKEW_STATS_CACHE,
        _skew_stats,
        q44_guarded_hot_key_agg,
        q47_guarded_skew_join,
    )

    sf = "/root/testdata/sf0.001"
    key = (spark.sparkContext.applicationId, sf)
    _SKEW_STATS_CACHE.pop(key, None)

    # measure-on-miss fallback intact: first read measures
    n_rows, n_keys, max_rows, ppm = _skew_stats(spark, sf, "events.user_id")
    assert n_rows > 0 and n_keys > 0 and ppm >= 1_000_000
    assert key in _SKEW_STATS_CACHE

    plain = {tuple(r) for r in q44_guarded_hot_key_agg(spark, sf).collect()}
    assert LAST["maybe_salted_agg"]["skew_ppm"] == ppm

    # sentinel: the guards must see this without any re-measurement
    _SKEW_STATS_CACHE[key]["events.user_id"] = (n_rows, n_keys, max_rows,
                                                99_000_000)
    salted = {tuple(r) for r in q44_guarded_hot_key_agg(spark, sf).collect()}
    assert LAST["maybe_salted_agg"]["skew_ppm"] == 99_000_000
    assert LAST["maybe_salted_agg"]["path"] == "salted"
    assert salted == plain

    jp = _skew_stats(spark, sf, "lineitem.l_suppkey")[3]
    plain_j = {tuple(r) for r in q47_guarded_skew_join(spark, sf).collect()}
    assert LAST["maybe_salted_join"]["skew_ppm"] == jp
    _SKEW_STATS_CACHE[key]["lineitem.l_suppkey"] = (1, 1, 1, 99_000_000)
    salted_j = {tuple(r) for r in q47_guarded_skew_join(spark, sf).collect()}
    assert LAST["maybe_salted_join"]["skew_ppm"] == 99_000_000
    assert LAST["maybe_salted_join"]["path"] == "salted"
    assert salted_j == plain_j

    _SKEW_STATS_CACHE.pop(key, None)


def test_skew_stats_persist_across_sessions(spark, tmp_path, monkeypatch):
    """r10 verdict task 6: the five-key audit persists as a tiny parquet
    keyed by dataset, so a SECOND session on the same dataset builds zero
    skew jobs. Proof: (1) cold measure writes the store; (2) simulate a
    new session (cleared dict) with a DOCTORED store value no measurement
    could produce — the guard must see it (store read, not re-scan) and
    must NOT overwrite it (no measurement ran)."""
    from research_data_pipeline_spark.queries import relational as R

    monkeypatch.setenv("SPARK_GRAFT_ARTIFACT_DIR", str(tmp_path))
    sf = "/root/testdata/sf0.001"
    key = (spark.sparkContext.applicationId, sf)
    R._SKEW_STATS_CACHE.pop(key, None)

    # (1) cold path measures and writes through
    measured = R._skew_stats(spark, sf, "events.user_id")
    assert measured[0] > 0
    store = R._skew_store_read(spark, sf)
    assert store["events.user_id"] == measured

    # (2) "second session": clear the dict, doctor the store
    R._SKEW_STATS_CACHE.pop(key, None)
    doctored = dict(store)
    doctored["events.user_id"] = (123, 45, 6, 77_000_000)
    R._skew_store_write(spark, sf, doctored)
    got = R._skew_stats(spark, sf, "events.user_id")
    assert got == (123, 45, 6, 77_000_000)  # only the store knows this
    # no measurement ran: the doctored row survived untouched
    assert R._skew_store_read(spark, sf)["events.user_id"] == got

    # flip behavior rides the persisted value identically: 77e6 ppm
    # trips the salting guard with bit-identical results
    from research_data_pipeline_spark.operators.decisions import LAST
    from research_data_pipeline_spark.queries.relational import (
        q44_guarded_hot_key_agg,
    )

    salted = {tuple(r) for r in q44_guarded_hot_key_agg(spark, sf).collect()}
    assert LAST["maybe_salted_agg"]["skew_ppm"] == 77_000_000
    assert LAST["maybe_salted_agg"]["path"] == "salted"
    R._SKEW_STATS_CACHE.pop(key, None)
    R._skew_store_write(spark, sf, store)  # restore real values
    plain = {tuple(r) for r in q44_guarded_hot_key_agg(spark, sf).collect()}
    assert salted == plain
    R._SKEW_STATS_CACHE.pop(key, None)


def test_skew_stats_cache_evicts_foreign_sessions(spark):
    """The cache contract: entries from a stopped/foreign applicationId
    are dropped on the next read (no unbounded growth across sessions)."""
    from research_data_pipeline_spark.queries.relational import (
        _SKEW_STATS_CACHE,
        _skew_stats,
    )

    sf = "/root/testdata/sf0.001"
    _SKEW_STATS_CACHE[("dead-app-id", sf)] = {"x": (1, 1, 1, 1)}
    _skew_stats(spark, sf, "events.user_id")
    assert ("dead-app-id", sf) not in _SKEW_STATS_CACHE
    key = (spark.sparkContext.applicationId, sf)
    assert key in _SKEW_STATS_CACHE
    _SKEW_STATS_CACHE.pop(key, None)
