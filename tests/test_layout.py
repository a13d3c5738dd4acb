"""Physical-layout assertions: bucketed joins drop the exchange; salted
joins match the plain join exactly."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from research_data_pipeline_spark.io.layout import n_exchanges, write_bucketed
from research_data_pipeline_spark.operators.skew import salted_join


@pytest.fixture(scope="module")
def warehouse(spark, tmp_path_factory):
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    yield spark
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_is_exchange_free(warehouse, sf_dir):
    spark = warehouse
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    write_bucketed(o, "b_orders", ["o_orderkey"], n_buckets=8)
    write_bucketed(
        l.withColumnRenamed("l_orderkey", "o_orderkey"), "b_lineitem",
        ["o_orderkey"], n_buckets=8,
    )
    bo, bl = spark.table("b_orders"), spark.table("b_lineitem")
    joined = bo.join(bl, "o_orderkey").groupBy("o_orderstatus").count()
    plain = o.join(
        l.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey"
    ).groupBy("o_orderstatus").count()
    # disable broadcast so both plans take the sort-merge path, making the
    # bucketing effect visible
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        assert n_exchanges(joined) < n_exchanges(plain)
        got = {r.o_orderstatus: r["count"] for r in joined.collect()}
        exp = {r.o_orderstatus: r["count"] for r in plain.collect()}
        assert got == exp
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_salted_join_matches_plain_join(spark, sf_dir):
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    n = spark.read.parquet(f"{sf_dir}/nation.parquet").withColumnRenamed(
        "n_nationkey", "key"
    )
    big = o.withColumn("key", (F.col("o_custkey") % 25).cast("int"))
    plain = big.join(n, "key").groupBy("n_name").count()
    salted = salted_join(big, n, "key", n_salts=4).groupBy("n_name").count()
    got = {r.n_name: r["count"] for r in salted.collect()}
    exp = {r.n_name: r["count"] for r in plain.collect()}
    assert got == exp
