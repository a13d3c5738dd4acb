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


def test_cascade_purge_diamond_unions_kill_keys(spark):
    """Multi-FK child (diamond): a row is doomed if ANY FK points at a
    doomed parent; the doomed set is an exact disjoint union (advisor's
    round-6 medium: the second entry used to overwrite the first's kill
    keys, silently under-purging)."""
    users = spark.createDataFrame([(1,), (2,), (3,)], "u_id int")
    teams = spark.createDataFrame([(7, 1), (8, 3), (9, 2)], "t_id int, t_owner int")
    # posts references BOTH users (author) and teams (team): diamond
    posts = spark.createDataFrame(
        # p10 doomed via author=1 only; p11 via team=7(owner 1) only;
        # p12 via BOTH; p13 survives (author 2, team 9->owner 2)
        [(10, 1, 9), (11, 2, 7), (12, 1, 7), (13, 2, 9)],
        "p_id int, p_author int, p_team int",
    )
    comments = spark.createDataFrame(
        [(100, 10), (101, 11), (102, 12), (103, 13)],
        "c_id int, c_post int",
    )
    forget = spark.createDataFrame([(1,)], "u_id int")
    purged, audit = cascade_purge(
        {"users": users, "teams": teams, "posts": posts, "comments": comments},
        "users",
        forget,
        [
            ("teams", "t_owner", "users", "u_id"),
            ("posts", "p_author", "users", "u_id"),
            ("posts", "p_team", "teams", "t_id"),
            ("comments", "c_post", "posts", "p_id"),
        ],
    )
    assert sorted(r[0] for r in purged["posts"].collect()) == [13]
    # descendants see the UNION-doomed posts (10, 11, 12), not just the
    # last entry's
    assert sorted(r[0] for r in purged["comments"].collect()) == [103]
    got = {r["tbl"]: (r["n_before"], r["n_purged"], r["n_after"])
           for r in audit.collect()}
    assert got["posts"] == (4, 3, 1)
    assert got["comments"] == (4, 3, 1)


def test_cascade_purge_rejects_child_entry_after_use_as_parent(spark):
    users = spark.createDataFrame([(1,)], "u_id int")
    teams = spark.createDataFrame([(7, 1)], "t_id int, t_owner int")
    posts = spark.createDataFrame([(10, 1, 7)], "p_id int, p_author int, p_team int")
    comments = spark.createDataFrame([(100, 10)], "c_id int, c_post int")
    forget = spark.createDataFrame([(1,)], "u_id int")
    with pytest.raises(ValueError, match="already used as a parent"):
        cascade_purge(
            {"users": users, "teams": teams, "posts": posts,
             "comments": comments},
            "users",
            forget,
            [
                ("teams", "t_owner", "users", "u_id"),
                ("posts", "p_author", "users", "u_id"),
                ("comments", "c_post", "posts", "p_id"),
                # posts gains another FK AFTER comments derived from it
                ("posts", "p_team", "teams", "t_id"),
            ],
        )


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
