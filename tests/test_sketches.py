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


def test_msprt_formula_fires_on_real_effect(spark):
    """s24's shared-text log-lambda formula against a literal python
    reference, on a crafted TRUE-effect case (the registered query's
    synthetic A/B split is null, so 'significant' is only ever False
    there — this pins the firing branch)."""
    import math

    from research_data_pipeline_spark.queries.sampling import (
        _SPRT_D, _SPRT_LOGL, _SPRT_V,
    )

    # arm A: 100 users at ~1000 cents, arm B: 100 users at ~0 cents
    na = nb = 100
    xa = [1000 + (i % 7) for i in range(na)]
    xb = [0 + (i % 7) for i in range(nb)]
    row = {
        "na": na, "nb": nb,
        "sxa": sum(xa), "sxb": sum(xb),
        "sxxa": sum(v * v for v in xa), "sxxb": sum(v * v for v in xb),
    }
    df = spark.createDataFrame(
        [tuple(row.values())],
        "na long, nb long, sxa long, sxb long, sxxa long, sxxb long",
    )
    got = df.selectExpr(
        f"{_SPRT_D} AS d", f"{_SPRT_V} AS v", f"{_SPRT_LOGL} AS ll"
    ).collect()[0]
    d = row["sxa"] / na - row["sxb"] / nb
    va = (row["sxxa"] - row["sxa"] ** 2 / na) / (na - 1) / na
    vb = (row["sxxb"] - row["sxb"] ** 2 / nb) / (nb - 1) / nb
    v = va + vb
    tau2 = 10000.0
    ll = 0.5 * math.log(v / (v + tau2)) + d * d * tau2 / (2 * v * (v + tau2))
    assert abs(got["d"] - d) < 1e-9
    assert abs(got["v"] - v) < 1e-9
    assert abs(got["ll"] - ll) < 1e-6 * max(1.0, abs(ll))
    assert got["ll"] > 2.995732273553991  # the effect fires the decision
