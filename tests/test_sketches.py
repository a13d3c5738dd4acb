"""Sketch operators: bounded error vs exact, and determinism."""

from __future__ import annotations

from pyspark.sql import functions as F

from research_data_pipeline_spark.operators import sketches


def test_approx_distinct_within_rsd(spark, sf_dir):
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    exact = o.select(F.countDistinct("o_custkey")).collect()[0][0]
    approx = sketches.approx_distinct(o, "o_custkey", rsd=0.05).collect()[0][0]
    assert abs(approx - exact) / exact < 0.15  # 3x rsd margin


def test_approx_quantiles_bounded_error(spark, sf_dir):
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    exact = o.select(F.median("o_totalprice")).collect()[0][0]
    [approx] = sketches.approx_quantiles(o, "o_totalprice", [0.5], accuracy=10_000)
    # rank error ≤ n/accuracy; translate loosely to value via spread
    lo, hi = o.select(F.min("o_totalprice"), F.max("o_totalprice")).collect()[0]
    assert abs(approx - exact) < (hi - lo) * 0.05


def test_hash_sample_deterministic_and_sized(spark, sf_dir):
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    s1 = sketches.hash_sample(o, "o_orderkey", 0.2)
    s2 = sketches.hash_sample(o.repartition(7), "o_orderkey", 0.2)
    ids1 = {r.o_orderkey for r in s1.select("o_orderkey").collect()}
    ids2 = {r.o_orderkey for r in s2.select("o_orderkey").collect()}
    assert ids1 == ids2  # survives repartitioning, unlike df.sample
    n = o.count()
    assert 0.1 * n < len(ids1) < 0.3 * n


def test_heavy_hitters_finds_dominant_value(spark, sf_dir):
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    hh = sketches.heavy_hitters(o, "o_orderpriority", support=0.05)
    true_top = (
        o.groupBy("o_orderpriority").count().orderBy(F.desc("count")).first()[0]
    )
    assert true_top in hh


def test_log_histogram_sketch_merges_losslessly(spark, sf_dir):
    """s19's scale claim: per-bucket counts built on disjoint halves and
    merged by addition equal the whole-input sketch exactly (the
    mergeability that lets 1000 executors build partials independently),
    and the picked quantile bucket always contains the exact quantile."""
    from research_data_pipeline_spark.queries.sampling import _LOGB, _LHQ_CENTS

    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet").where(
        "l_extendedprice > 0"
    )
    c = l.selectExpr(f"{_LHQ_CENTS} AS v", "l_orderkey")
    bkt = f"CAST({_LOGB} AS BIGINT)"

    def hist(df):
        rows = df.selectExpr(f"{bkt} AS bkt").groupBy("bkt").count().collect()
        return {r["bkt"]: r["count"] for r in rows}

    whole = hist(c)
    h1 = hist(c.where("l_orderkey % 2 = 0"))
    h2 = hist(c.where("l_orderkey % 2 = 1"))
    merged: dict = {}
    for h in (h1, h2):
        for k, v in h.items():
            merged[k] = merged.get(k, 0) + v
    assert merged == whole
