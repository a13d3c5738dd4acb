"""Registered guarded queries vs their DuckDB oracles on a corpus hot
enough to FLIP the salting guards — the flip tests in test_skew.py
prove path equality on synthetic frames; this proves the full
registered artifact (guard + cached stats + oracle compare) on data
where the salted path actually executes. Corpus note: max/mean skew is
capped at n_keys×1e6 ppm, so the fixture needs MANY cold keys
(sf0.01's 100 suppliers / 150 users), not just a big hot one."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def skewed_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("skewed_tables"))
    for t in TABLES:
        df = spark.read.parquet(f"/root/testdata/sf0.01/{t}.parquet")
        if t == "events":  # 70% of events funnel into user 7
            df = df.withColumn(
                "user_id",
                F.when(F.col("event_id") % 10 < 7, F.lit(7))
                .otherwise(F.col("user_id")),
            )
        if t == "lineitem":  # 70% of lines funnel into supplier 3
            df = df.withColumn(
                "l_suppkey",
                F.when(F.col("l_orderkey") % 10 < 7, F.lit(3))
                .otherwise(F.col("l_suppkey")),
            )
        df.write.parquet(f"{d}/{t}.parquet")
    return d


@pytest.mark.parametrize("name,guard", [
    ("q44_guarded_hot_key_agg", "maybe_salted_agg"),
    ("q47_guarded_skew_join", "maybe_salted_join"),
])
def test_guarded_query_oracle_exact_on_flipped_path(
    spark, skewed_dir, name, guard
):
    from research_data_pipeline_spark.operators.decisions import LAST
    from research_data_pipeline_spark.registry import all_specs

    from .oracle import assert_parity

    spec = all_specs()[name]
    assert_parity(spec.fn(spark, skewed_dir), spec.oracle, skewed_dir, name)
    assert LAST[guard]["path"] == "salted", LAST[guard]
    assert LAST[guard]["skew_ppm"] >= 10_000_000


def test_skew_audit_oracle_exact_on_hot_corpus(spark, skewed_dir):
    from research_data_pipeline_spark.registry import all_specs

    from .oracle import assert_parity

    spec = all_specs()["q43_join_skew_audit"]
    assert_parity(spec.fn(spark, skewed_dir), spec.oracle, skewed_dir, "q43")
