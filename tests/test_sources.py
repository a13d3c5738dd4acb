"""Columnar/interchange source readers (ORC, Avro gating)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from research_data_pipeline_spark.io import sources


def test_orc_roundtrip(spark, sf_dir, tmp_path):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    dest = str(tmp_path / "orders_orc")
    orders.write.orc(dest)
    back = sources.read_orc(spark, dest)
    assert back.count() == orders.count()
    a = orders.agg(F.sum("o_orderkey")).collect()[0][0]
    b = back.agg(F.sum("o_orderkey")).collect()[0][0]
    assert a == b


def test_orc_schema_prunes_read(spark, sf_dir, tmp_path):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    dest = str(tmp_path / "orders_orc2")
    orders.write.orc(dest)
    pruned = sources.read_orc(spark, dest, orders.select("o_orderkey").schema)
    assert pruned.columns == ["o_orderkey"]


def test_avro_reader_gated(spark, sf_dir, tmp_path):
    # this deployment may or may not ship spark-avro; either a clean
    # NotImplementedError or a working read is acceptable — an opaque
    # ClassNotFoundException is not
    try:
        sources.read_avro(spark, str(tmp_path / "nonexistent.avro"))
    except NotImplementedError:
        pass
    except Exception as ex:
        assert "Path does not exist" in str(ex) or "PATH_NOT_FOUND" in str(ex)


def test_register_views_sql_surface(spark, sf_dir):
    from research_data_pipeline_spark.tables import register_views

    register_views(spark, sf_dir)
    out = spark.sql(
        """
        SELECT n.n_name, COUNT(*) AS n_customers
        FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name ORDER BY n_customers DESC, n.n_name LIMIT 3
        """
    ).collect()
    assert len(out) == 3 and out[0]["n_customers"] >= out[-1]["n_customers"]


def test_dynamic_partition_overwrite_touches_only_written_partitions(
    spark, sf_dir, tmp_path
):
    from pyspark.sql import functions as F

    from research_data_pipeline_spark.io.sinks import write_partitions_incremental

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").withColumn(
        "prio", F.col("o_orderpriority")
    )
    dest = str(tmp_path / "orders_part")
    write_partitions_incremental(orders, dest, ["prio"])
    total_before = spark.read.parquet(dest).count()

    one_prio = orders.select("prio").orderBy("prio").first()["prio"]
    patch = orders.where(F.col("prio") == one_prio).limit(10)
    write_partitions_incremental(patch, dest, ["prio"])

    after = spark.read.parquet(dest)
    # the patched partition shrank to 10 rows; every other partition is intact
    assert after.where(F.col("prio") == one_prio).count() == 10
    assert (
        after.where(F.col("prio") != one_prio).count()
        == total_before - orders.where(F.col("prio") == one_prio).count()
    )
