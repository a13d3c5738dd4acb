"""cascade_purge: transitive closure, leak-free keeps, audit math."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from research_data_pipeline_spark.operators.retention import cascade_purge


def test_cascade_purge_transitive_and_leak_free(spark):
    cust = spark.createDataFrame([(1,), (2,), (3,)], "c_custkey int")
    orders = spark.createDataFrame(
        [(10, 1), (11, 1), (12, 2), (13, 3)], "o_orderkey int, o_custkey int"
    )
    items = spark.createDataFrame(
        [(10, 100), (10, 101), (12, 102), (13, 103)],
        "l_orderkey int, l_partkey int",
    )
    other = spark.createDataFrame([(9,)], "x int")
    forget = spark.createDataFrame([(1,)], "c_custkey int")
    purged, audit = cascade_purge(
        {"customer": cust, "orders": orders, "lineitem": items, "other": other},
        "customer",
        forget,
        [
            ("orders", "o_custkey", "customer", "c_custkey"),
            ("lineitem", "l_orderkey", "orders", "o_orderkey"),
        ],
    )
    assert sorted(r[0] for r in purged["customer"].collect()) == [2, 3]
    assert sorted(r[0] for r in purged["orders"].collect()) == [12, 13]
    assert sorted(r[1] for r in purged["lineitem"].collect()) == [102, 103]
    assert purged["other"].count() == 1  # untouched tables pass through
    got = {r["tbl"]: (r["n_before"], r["n_purged"], r["n_after"])
           for r in audit.collect()}
    assert got == {
        "customer": (3, 1, 2),
        "orders": (4, 2, 2),
        "lineitem": (4, 2, 2),
    }


def test_cascade_purge_rejects_out_of_order_cascades(spark):
    cust = spark.createDataFrame([(1,)], "c_custkey int")
    items = spark.createDataFrame([(10, 100)], "l_orderkey int, l_partkey int")
    forget = spark.createDataFrame([(1,)], "c_custkey int")
    with pytest.raises(ValueError, match="unpurged parent"):
        cascade_purge(
            {"customer": cust, "lineitem": items},
            "customer",
            forget,
            [("lineitem", "l_orderkey", "orders", "o_orderkey")],
        )
